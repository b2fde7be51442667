"""Stream identity tied to the CHECKPOINT'S LIFETIME, not its path.

Every streaming face here namespaces its exactly-once manifest keys as
``{prefix}:{stream_id}:{batch_id}`` and the lake folds them into bounded
per-prefix watermarks. Micro-batch ids are only unique per checkpoint
*incarnation*: if the checkpoint directory is deleted and recreated at
the same path, the restarted query numbers batches from 0 again — and a
path-hashed stream id would make the old watermark silently swallow the
genuinely new batches 0..N as "already applied".

:func:`stream_identity` therefore salts the id with a marker persisted
INSIDE the checkpoint directory on first use: same checkpoint → same id
(restarts stay idempotent); rebuilt checkpoint → marker gone → fresh id
→ fresh manifest prefix whose watermark starts empty. Plain POSIX IO by
design — the whole lake layer is (see LakeTable's docstring); the marker
lives next to Spark's own offset log, so it shares the checkpoint's
durability.
"""

from __future__ import annotations

import hashlib
import os
import uuid

__all__ = ["stream_identity"]

_MARKER = "_etl_spark_stream_id"


def stream_identity(checkpoint_dir: str) -> str:
    """Return the 12-hex stream id for this checkpoint incarnation,
    minting and persisting one on first use (atomic create — two racing
    first starters converge on whichever marker lands)."""
    cp = os.path.abspath(checkpoint_dir)
    os.makedirs(cp, exist_ok=True)
    marker = os.path.join(cp, _MARKER)
    if not os.path.exists(marker):
        salt = uuid.uuid4().hex
        fresh = hashlib.sha256(f"{cp}:{salt}".encode()).hexdigest()[:12]
        tmp = marker + f".tmp.{salt[:8]}"
        with open(tmp, "w") as fh:
            fh.write(fresh)
        try:
            # atomic claim: first writer wins, losers reuse the winner's id
            os.link(tmp, marker)
        except FileExistsError:
            pass
        finally:
            os.unlink(tmp)
    with open(marker) as fh:
        return fh.read().strip()
