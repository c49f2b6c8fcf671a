"""TPU-native DNA data-storage decoding framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference pipeline sjpark0905/DNA-LDPC-codes (see SURVEY.md): RS-LDPC code
construction, batched flooding sum-product LDPC belief propagation,
RS(8,4)/GF(16) index decoding, soft-information (LLR) extraction over
clustered variable-length sequencing reads, pair-HMM-based multiple
sequence alignment (MUSCLE replacement), epsilon-annealing re-decode, and
multi-device sharding over TPU meshes.
"""

__version__ = "0.1.0"
