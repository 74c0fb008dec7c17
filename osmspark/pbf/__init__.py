from .decode import (
    DecodedBlock,
    DecodedGroup,
    FileBlock,
    PbfError,
    decode_header_block,
    decode_primitive_block,
    inflate_blob,
    split_file_blocks,
)
