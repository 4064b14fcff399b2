from .object_store import (ObjectMeta, ObjectStore, LocalStore, get_store,
                           resolve_table_files)
from .compression import Compression, decompress, infer_compression
