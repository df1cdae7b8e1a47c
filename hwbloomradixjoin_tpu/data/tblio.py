""".tbl text-table IO, format-compatible with the reference.

write_relation (generator.c:250-263) emits a "#KEY, VAL" header then
"%d %d" rows; read_relation (generator.c:685-741) auto-detects space/comma
separators and tolerates key-only rows.  These files are the cross-validation
interface with the reference binary (PERSIST_RELATIONS) and the Wisconsin
engine's pipe-delimited tables.
"""

from __future__ import annotations

import numpy as np


def write_relation(path: str, keys: np.ndarray, payloads: np.ndarray) -> None:
    keys = np.asarray(keys)
    payloads = np.asarray(payloads)
    with open(path, "w") as f:
        f.write("#KEY, VAL\n")
        # column-stack + savetxt is far faster than a python loop
        np.savetxt(f, np.column_stack([keys, payloads]), fmt="%d")


def read_relation(path: str, num_tuples: int | None = None):
    """Read a .tbl file; supports 'k v', 'k,v', 'k|v' and key-only rows."""
    with open(path) as f:
        first = f.readline()
        if not first.startswith("#"):
            f.seek(0)
        sample = f.readline()
        f.seek(0)
        if not first.startswith("#"):
            pass
        else:
            f.readline()  # skip header again after seek
        if "," in sample:
            delim = ","
        elif "|" in sample:
            delim = "|"
        else:
            delim = None  # whitespace
        data = np.loadtxt(f, delimiter=delim, dtype=np.int64, ndmin=2,
                          max_rows=num_tuples)
    keys = data[:, 0].astype(np.int32)
    if data.shape[1] > 1:
        payloads = data[:, 1].astype(np.int32)
    else:
        payloads = np.zeros(len(keys), dtype=np.int32)
    return keys, payloads
