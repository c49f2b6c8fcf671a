from .ldpc_graph import LdpcGraph  # noqa: F401
from .rs_ldpc import build_rs_ldpc, dna_storage_pchk  # noqa: F401
from .blocked import BlockedCode, dna_storage_blocked  # noqa: F401
from .codebook import index_codebook, codebook_lookup, codebook_rank  # noqa: F401
