from .tensor import SparseTensor, downsample_coords, kernel_offsets  # noqa: F401
from .hashtable import (  # noqa: F401
    HashTable,
    build_table,
    build_table_dedup,
    build_tables_ragged,
    lookup,
    lookup_grouped_ragged,
)
from .conv import sparse_conv, sparse_conv_transpose, table_for  # noqa: F401
