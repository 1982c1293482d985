"""Arrow-native extraction of an embedding column (list<float>) into a
dense (n, d) numpy matrix.

Why not ``tbl.to_pandas()`` + ``np.stack``: the pandas conversion of a
whole block (a) copies every column including heavy payload ones the
kernel never reads, and (b) goes through pyarrow's pandas-metadata
reconstruction, which raises on blocks whose schema metadata names a
dtype pandas can't rebuild — observed as a nondeterministic task failure
depending on which upstream op produced the block. Reading the list
array's flat values + offsets touches only the needed buffers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_column_matrix(tbl: pa.Table, col: str) -> np.ndarray:
    """Return the ``col`` list column of ``tbl`` as an (n, d) float64
    matrix. Requires rectangular, non-null lists (the embedding-table
    contract)."""
    arr = tbl.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    if isinstance(arr, pa.ExtensionArray):
        # Ray's ArrowTensorArray (blocks that went through a numpy
        # map_batches) converts straight to an (n, d) ndarray; any other
        # extension falls back to its storage array below
        x = arr.to_numpy(zero_copy_only=False)
        if isinstance(x, np.ndarray) and x.dtype != object and x.ndim == 2:
            return x.astype(np.float64, copy=False)
        arr = arr.storage
    if arr.null_count:
        raise ValueError(f"list column {col!r} has nulls")
    if pa.types.is_fixed_size_list(arr.type):
        d = arr.type.list_size
        flat = arr.values.to_numpy(zero_copy_only=False)
        # .values of a sliced FixedSizeListArray already accounts for the
        # slice offset in pyarrow >= 13
        return flat.astype(np.float64, copy=False).reshape(n, d)
    offsets = np.asarray(arr.offsets)
    widths = np.diff(offsets)
    d = int(widths[0])
    if not (widths == d).all():
        raise ValueError(f"list column {col!r} is ragged")
    flat = arr.values.to_numpy(zero_copy_only=False)
    return (
        flat[offsets[0] : offsets[-1]].astype(np.float64, copy=False).reshape(n, d)
    )
