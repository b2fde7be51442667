"""Named snapshot refs: immutable TAGS and movable BRANCH pointers over
the snapshot log — Iceberg table refs (``tag`` / ``branch``) re-expressed
on LakeTable's linear version chain.

Why refs exist in a CDC lake
----------------------------
Retention (`expire_snapshots`) and reclamation (`vacuum`) walk forward
relentlessly: without a pin, the "known-good vintage the analysts signed
off" is three commits from deletion at all times. A ref is that pin with
*retention force*:

- ``expire_snapshots`` NEVER expires a ref target (the snapshot JSON
  survives however old it gets), and
- ``vacuum`` consequently never reclaims the target's data files (it
  deletes only files referenced by no remaining snapshot).

So ``table.tag("q2-audited")`` is a durable, named, O(1)-metadata
time-travel anchor; ``table.drop_ref("q2-audited")`` releases it back to
the normal retention lifecycle. This is the lake-native analogue of the
reference's savepoint-table copies (utilitarios/bd.py:224-257 copies a
whole Postgres table aside before mutating it) — same guarantee, zero
data movement.

Two ref kinds, Iceberg semantics:

- **tag** — immutable. Creating an existing name raises; the pointer
  never moves. Use for audit vintages, reproducibility pins (the exact
  state a model trained on), erasure evidence ("pre-purge" must NOT be
  tagged, and tests assert purged files are physically gone — a tag
  would keep them, which is exactly why `purge` docs say drop pins
  first).
- **branch** — movable. ``move_branch`` advances (or rewinds) the
  pointer; consumers that read ``version="stable"`` see updates only
  when an operator moves the branch, decoupling *publish cadence* from
  *commit cadence*. Composes with write-audit-publish (lake/wap.py):
  ingest commits every wave, audits run against the live head, and
  ``move_branch("stable", audited_version)`` is the O(1) "promote to
  consumers" flip.

Resolution is engine-wide: ``LakeTable.snapshot()`` (and therefore
``read`` / ``folded_state`` / ``lookup`` / time travel everywhere) and
``changes()`` accept a ref NAME wherever they accept a version number.

Storage & concurrency
---------------------
One JSON file per ref under ``<table>/_refs/<name>.json`` — the same
metadata plane as the snapshot log, O(1) bytes each. Creation uses the
hard-link publish trick (``os.link`` fails iff the name exists →
``CommitConflict``, exactly like snapshot publication); branch moves are
a ``write-tmp + os.replace`` atomic swap (POSIX rename atomicity), with
last-writer-wins documented for concurrent movers: a branch pointer is
an operator action, not a data-plane write, and the snapshot it points
at is immutable either way. Ref reads never race partially-written
files (replace is atomic; link targets are fully written first).
"""

from __future__ import annotations

import json
import os
import re
import uuid
from dataclasses import dataclass

_REFS_DIR = "_refs"
_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,127}$")


@dataclass(frozen=True)
class Ref:
    name: str
    kind: str      # "tag" | "branch"
    version: int   # snapshot version the ref pins

    def to_json(self) -> str:
        return json.dumps(
            {"name": self.name, "kind": self.kind, "version": self.version},
            sort_keys=True,
        )

    @staticmethod
    def from_json(text: str) -> "Ref":
        d = json.loads(text)
        return Ref(name=d["name"], kind=d["kind"], version=int(d["version"]))


def _refs_dir(table_path: str) -> str:
    return os.path.join(table_path, _REFS_DIR)


def _ref_path(table_path: str, name: str) -> str:
    return os.path.join(_refs_dir(table_path), f"{name}.json")


def _validate_name(name: str) -> None:
    if not _NAME_RE.match(name or ""):
        raise ValueError(
            f"invalid ref name {name!r}: must match {_NAME_RE.pattern}"
        )


def list_refs(table_path: str) -> dict[str, Ref]:
    """All refs of a table, name → Ref. Missing dir = no refs yet."""
    d = _refs_dir(table_path)
    if not os.path.isdir(d):
        return {}
    out: dict[str, Ref] = {}
    for fn in sorted(os.listdir(d)):
        if fn.endswith(".json") and not fn.startswith("."):
            with open(os.path.join(d, fn)) as fh:
                ref = Ref.from_json(fh.read())
            out[ref.name] = ref
    return out


def load_ref(table_path: str, name: str) -> Ref:
    _validate_name(name)
    path = _ref_path(table_path, name)
    try:
        with open(path) as fh:
            return Ref.from_json(fh.read())
    except FileNotFoundError:
        raise KeyError(f"no ref named {name!r} on table {table_path}") from None


def create_ref(table_path: str, name: str, kind: str, version: int,
               known_versions: list[int]) -> Ref:
    """Create a tag or branch. Exclusive: an existing name (either kind)
    raises ``CommitConflict`` — tags are immutable and a branch must be
    moved with :func:`move_branch`, never re-created over."""
    from etl_spark.lake.table import CommitConflict

    _validate_name(name)
    if kind not in ("tag", "branch"):
        raise ValueError(f"ref kind must be 'tag' or 'branch', got {kind!r}")
    if version not in known_versions:
        known = (f"{known_versions[:3]}..{known_versions[-3:]}"
                 if len(known_versions) > 6 else f"{known_versions}")
        raise ValueError(
            f"cannot create ref {name!r}: snapshot v{version} does not "
            f"exist (or was already expired); known versions {known}"
        )
    os.makedirs(_refs_dir(table_path), exist_ok=True)
    ref = Ref(name=name, kind=kind, version=version)
    final = _ref_path(table_path, name)
    tmp = final + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        fh.write(ref.to_json())
    try:
        os.link(tmp, final)  # fails iff the name already exists
    except FileExistsError as exc:
        raise CommitConflict(
            f"ref {name!r} already exists on table {table_path}"
        ) from exc
    finally:
        os.unlink(tmp)
    return ref


def move_branch(table_path: str, name: str, version: int,
                known_versions: list[int]) -> Ref:
    """Atomically repoint a BRANCH (refuses on tags: immutable by
    contract). Moves both forward and backward — rewinding a consumer
    branch is the metadata-only consumer rollback (the table's own
    history is untouched, unlike ``LakeTable.rollback`` which republishes
    data as a new commit)."""
    cur = load_ref(table_path, name)
    if cur.kind != "branch":
        raise ValueError(
            f"ref {name!r} is a tag — tags are immutable; drop and "
            f"re-create, or use a branch for a movable pointer"
        )
    if version not in known_versions:
        raise ValueError(
            f"cannot move branch {name!r}: snapshot v{version} does not "
            f"exist (or was already expired)"
        )
    ref = Ref(name=name, kind="branch", version=version)
    final = _ref_path(table_path, name)
    tmp = final + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        fh.write(ref.to_json())
    os.replace(tmp, final)  # atomic pointer swap
    return ref


def drop_ref(table_path: str, name: str) -> Ref:
    """Remove a ref, releasing its target back to normal retention.
    Returns the dropped ref (so callers can log what was released)."""
    ref = load_ref(table_path, name)
    os.unlink(_ref_path(table_path, name))
    return ref


def protected_versions(table_path: str) -> set[int]:
    """Versions pinned by any ref — ``expire_snapshots`` must keep these
    (and thereby ``vacuum`` keeps their files)."""
    return {r.version for r in list_refs(table_path).values()}
