from .bitstream import MAGIC, VERSION, read_bitstream, write_bitstream

__all__ = ["MAGIC", "VERSION", "read_bitstream", "write_bitstream"]
