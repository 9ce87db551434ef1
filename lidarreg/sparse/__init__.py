from .tensor import SparseTensor, downsample_coords, kernel_offsets  # noqa: F401
from .hashtable import build_table, lookup, HashTable  # noqa: F401
from .conv import sparse_conv, sparse_conv_transpose, table_for  # noqa: F401
