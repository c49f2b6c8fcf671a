from . import dna, gf, io_formats  # noqa: F401
