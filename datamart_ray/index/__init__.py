from datamart_ray.index.build import IndexConfig, build_index
from datamart_ray.index.codec import (
    decode_docids,
    encode_docids,
    pack_ints,
    unpack_ints,
    varbyte_decode,
    varbyte_encode,
)

__all__ = [
    "IndexConfig",
    "build_index",
    "encode_docids",
    "decode_docids",
    "pack_ints",
    "unpack_ints",
    "varbyte_encode",
    "varbyte_decode",
]
