"""Per-file Bloom filters for LakeTable point-read file skipping.

Zone maps (lake/stats.py) prune on *ranges*: they are strong for columns
the layout clusters (compaction key-sorts each bucket) and useless for
high-cardinality columns whose values scatter across every file — the
per-file [min, max] of an unsorted id column spans nearly the whole
domain, so an equality probe never refutes anything. That is exactly the
shape of a CDC point read at 100 TB ("which files in this bucket hold key
K?", "which rows carry commit C?"). Iceberg and Delta answer it with
per-file Bloom filters; LakeTable gets the same capability here.

* **Store** — a bloom is one more entry in the snapshot's existing
  ``file_stats`` map under the reserved key ``"<col>#bloom"`` (column
  names in bloom-enabled tables may not contain ``#``), valued
  ``[b64(zlib(bitmap)), m_bits, k_hashes]``. It therefore inherits ALL of
  the zone-map lifecycle for free: carried while its file is referenced,
  dropped when the file is de-referenced, backfillable, bounded metadata.
  Enable with the ``bloom_cols`` table prop (plus optional ``bloom_bits``,
  default 65,536 = an 8 KiB bitmap ≈ 1% false positives for ~6.8k distinct
  values at k=7, degrading *gracefully, never unsoundly* for bigger files;
  tune up for wide files) — dormant without it.
* **Build** — one zero-shuffle job per commit over the freshly written
  files only: the double-hash bases are computed JVM-side
  (``md5`` + ``conv``, whole-stage codegen), then an Arrow
  ``mapInPandas`` kernel ORs per-partition partial bitmaps with numpy and
  emits a few KiB per (partition, file, col); the driver ORs the partials.
  No shuffle, no collect of positions — the only driver traffic is
  compressed bitmaps.
* **Probe** — driver-side at plan time: ``file_matches`` (lake/stats.py)
  consults the bloom for ``=`` / ``in`` predicates after the zone map.
  WHICH predicates may prune WHICH file is unchanged — the merge-on-read
  soundness rules of ``prunable_predicates`` gate blooms exactly as they
  gate zone maps (a bloom is just a second way to *refute*, with false
  positives only, never false negatives: every value present in the file
  is inserted, including key values on tombstone rows, whose files must
  survive pruning so a deletion can win its key's LWW).

**Engine-portable hashing.** Both sides hash the value's *canonical
string* (Spark ``CAST(col AS STRING)`` == Python ``str()`` for strings and
integers, ``date.isoformat()`` for dates — the only types allowed, see
``BLOOMABLE_TYPES``; floats/timestamps are rejected because their string
forms diverge across engines). Double hashing à la Kirsch-Mitzenmacher
over one md5: h1 = md5[0:15] hex, h2 = md5[15:30] hex | 1, position_i =
((h1 % m) + i * (h2 % m)) % m — the mod-first form keeps every
intermediate < 16·m, bit-identical between JVM longs and Python ints.
Same md5-substring trick as functions/hashing.py::portable_hash60, so a
DuckDB oracle can replay membership exactly.

Reference analogue: the memoized per-value point SELECTs the reference
issues against dimension tables (/root/reference/src/impulsoetl/comum/
geografias.py:78-97) — at lake scale the "index" must live in file
metadata, not in a driver cache.
"""

from __future__ import annotations

import base64
import datetime as dt
import hashlib
import os
import zlib
from functools import lru_cache
from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "BLOOM_SUFFIX",
    "DEFAULT_BITS",
    "DEFAULT_K",
    "BLOOMABLE_TYPES",
    "canonical_probe",
    "bloom_positions",
    "bloom_may_contain",
    "build_file_blooms",
    "validate_bloom_cols",
]

BLOOM_SUFFIX = "#bloom"
DEFAULT_BITS = 65536
DEFAULT_K = 7

# Spark typeName() strings whose CAST(x AS STRING) equals the Python
# canonical form below. Floats (locale/precision), timestamps ('T' vs ' ')
# and decimals (trailing zeros) diverge and are rejected.
BLOOMABLE_TYPES = {"string", "integer", "long", "short", "byte", "date"}


def canonical_probe(value) -> str | None:
    """Python-side canonical string of a probe value — must equal Spark's
    ``CAST(value AS STRING)`` for every BLOOMABLE type. None for values
    we cannot canonicalize (probe then never prunes)."""
    if value is None:
        return None
    if isinstance(value, str):
        return value
    if isinstance(value, bool):  # bool is an int subclass — reject first
        return None
    if isinstance(value, int):
        return str(value)
    if isinstance(value, dt.datetime):  # datetime is a date subclass
        return None
    if isinstance(value, dt.date):
        return value.isoformat()
    return None


def bloom_positions(canonical: str, m: int, k: int) -> list[int]:
    """The k bit positions of a canonical value (see module docstring for
    the exact mod-first double-hash form mirrored JVM-side)."""
    hx = hashlib.md5(canonical.encode("utf-8")).hexdigest()
    h1 = int(hx[:15], 16) % m
    h2 = (int(hx[15:30], 16) | 1) % m
    return [(h1 + i * h2) % m for i in range(k)]


@lru_cache(maxsize=4096)
def _bitmap(b64: str) -> bytes:
    return zlib.decompress(base64.b64decode(b64))


def bloom_may_contain(entry: list, value) -> bool:
    """May the file contain ``value``? ``entry`` = [b64, m, k] from the
    snapshot. Unknown/mis-typed values answer True (never prune)."""
    canonical = canonical_probe(value)
    if canonical is None:
        return True
    b64, m, k = entry[0], int(entry[1]), int(entry[2])
    try:
        bits = _bitmap(b64)
    except Exception:  # noqa: BLE001 — corrupt entry: keep the file
        return True
    for pos in bloom_positions(canonical, m, k):
        if not (bits[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


def validate_bloom_cols(schema, cols: Iterable[str]) -> None:
    """Raise at declaration time (create / backfill) if a bloom column is
    absent, non-bloomable, or would collide with the reserved key space."""
    by_name = {f.name: f.dataType.typeName() for f in schema.fields}
    for c in cols:
        if "#" in c:
            raise ValueError(f"bloom column {c!r} may not contain '#' "
                             f"(reserved for '<col>{BLOOM_SUFFIX}' keys)")
        t = by_name.get(c)
        if t is None:
            raise ValueError(f"bloom column {c!r} not in table schema")
        if t not in BLOOMABLE_TYPES:
            raise ValueError(
                f"bloom column {c!r} has type {t!r}; engine-portable "
                f"hashing supports only {sorted(BLOOMABLE_TYPES)} "
                f"(CAST-to-string must match Python's canonical form)")


def _h_mod_exprs(col: str, m: int):
    """JVM-side (h1 % m, h2 % m) of CAST(col AS STRING) — the same md5
    split as bloom_positions; NULL values yield NULL (skipped: a bloom
    never needs NULL, equality predicates cannot select it)."""
    hx = F.md5(F.col(col).cast("string"))
    h1 = F.conv(F.substring(hx, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(hx, 16, 15), 16, 10).cast("long").bitwiseOR(
        F.lit(1).cast("long"))
    return (h1 % m).cast("long"), (h2 % m).cast("long")


def build_file_blooms(
    df: DataFrame,
    file_col: str,
    cols: list[str],
    root: str,
    m: int = DEFAULT_BITS,
    k: int = DEFAULT_K,
) -> dict[str, dict[str, list]]:
    """Build per-file blooms for ``cols`` over ``df`` (which must carry
    ``file_col`` = input_file_name()). Returns
    ``{rel_path: {"<col>#bloom": [b64, m, k]}}``.

    Zero-shuffle: hash bases JVM-side, per-partition partial bitmaps in an
    Arrow kernel, driver ORs the partials (a handful of compressed KiB per
    file — the bitmaps, never the positions, cross to the driver)."""
    import pandas as pd  # Arrow kernel only (CLAUDE.md: no row-at-a-time)

    if not cols:
        return {}
    sel = [F.col(file_col).alias("__f")]
    for i, c in enumerate(cols):
        h1m, h2m = _h_mod_exprs(c, m)
        sel += [h1m.alias(f"__h1_{i}"), h2m.alias(f"__h2_{i}")]
    slim = df.select(*sel)
    n_cols = len(cols)
    nbytes = m // 8

    def _kernel(batches):
        import numpy as np

        partial: dict[tuple[str, int], "np.ndarray"] = {}
        for pdf in batches:
            for f, grp in pdf.groupby("__f", sort=False):
                for i in range(n_cols):
                    h1 = grp[f"__h1_{i}"].dropna().to_numpy("int64")
                    if h1.size == 0:
                        continue
                    h2 = grp[f"__h2_{i}"].loc[grp[f"__h1_{i}"].notna()] \
                        .to_numpy("int64")
                    bm = partial.get((f, i))
                    if bm is None:
                        bm = partial[(f, i)] = np.zeros(nbytes, np.uint8)
                    for j in range(k):
                        pos = (h1 + j * h2) % m
                        np.bitwise_or.at(bm, pos >> 3,
                                         (1 << (pos & 7)).astype(np.uint8))
        out = {"f": [], "i": [], "bm": []}
        for (f, i), bm in partial.items():
            out["f"].append(f)
            out["i"].append(i)
            out["bm"].append(zlib.compress(bm.tobytes(), 1))
        yield pd.DataFrame(out)

    rows = slim.mapInPandas(_kernel, schema="f string, i int, bm binary") \
        .collect()

    import numpy as np

    root = os.path.abspath(root).rstrip("/") + "/"
    merged: dict[tuple[str, int], "np.ndarray"] = {}
    for r in rows:
        key = (r["f"], r["i"])
        bm = np.frombuffer(zlib.decompress(r["bm"]), np.uint8)
        got = merged.get(key)
        merged[key] = bm if got is None else (got | bm)
    out: dict[str, dict[str, list]] = {}
    for (uri, i), bm in merged.items():
        path = uri.split("://", 1)[-1] if "://" in uri else uri
        rel = path.split(root, 1)[-1] if root in path else path
        out.setdefault(rel, {})[cols[i] + BLOOM_SUFFIX] = [
            base64.b64encode(zlib.compress(bm.tobytes(), 6)).decode("ascii"),
            m, k,
        ]
    return out
