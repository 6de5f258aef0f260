"""Write-once scratch materialization with atomic publish.

Several queries materialize a derived copy of a fixture table (a
partitioned layout, an evolving-schema directory, a JSONL/CSV/ORC
round-trip batch) so the READ path under test is a genuine on-disk
layout. Those scratch directories have two hazards the naive
``mode("overwrite")``-per-invocation write does not handle:

- **stale reuse** — a ``_SUCCESS``-gated "skip if present" check keyed
  only by scale factor silently serves an OLD layout after a code
  change to the layout itself;
- **concurrent overwrite** — two concurrent runs (bench + pytest on
  the same SF) interleave ``overwrite``'s delete with the other run's
  lazy scan, which then dies with ``FileNotFoundException`` on the
  part-files its ``InMemoryFileIndex`` already listed.

The contract here fixes both:

- the final path embeds a **layout signature** (a hash of a caller-
  maintained spec string covering every input that determines the
  directory's contents), so changing the layout changes the path and
  can never reuse a stale tree;
- the build lands in a **process-unique sibling** directory and is
  published with one atomic ``os.rename``; a directory that EXISTS is
  therefore always COMPLETE, repeat calls reuse it without any write,
  and a concurrent loser simply discards its own build. Published
  trees are immutable — nothing ever deletes files under a reader.

At 100 TB the same discipline is the table-format contract (snapshot
directories published by atomic manifest swap, never mutated in
place); here it is three lines of stdlib.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid
from typing import Callable

_PREFIX = "/tmp/magshield_"


def scratch_path(name: str, sf_dir: str, signature: str) -> str:
    """Deterministic scratch directory for (*name*, SF, layout spec).

    *signature* must mention every knob that determines the directory's
    contents (filters, column lists, corrupt-line payloads, partition
    derivations, a version token) — it is hashed into the path, which
    is what makes stale reuse structurally impossible.
    """
    sf = os.path.basename(os.path.normpath(sf_dir))
    sig = hashlib.md5(signature.encode("utf-8")).hexdigest()[:10]
    return f"{_PREFIX}{name}_{sf}_{sig}"


def ensure_scratch(final_path: str, build: Callable[[str], None]) -> str:
    """Materialize *final_path* exactly once, atomically.

    *build(tmp)* must create the full tree under ``tmp`` (which does
    not yet exist; Spark writers and ``os.makedirs`` both create it).
    First publisher wins via atomic rename; losers clean up their own
    build. An existing directory is trusted as complete — partial
    trees are never visible under *final_path* because rename is the
    only way anything appears there.
    """
    if os.path.isdir(final_path):
        return final_path
    tmp = f"{final_path}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    try:
        build(tmp)
    except BaseException:
        # a failed build must leave no debris and no published path —
        # the next call retries from scratch
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    try:
        os.rename(tmp, final_path)
    except OSError:
        # a concurrent builder published first; its tree is identical
        # by the signature contract — use it, drop ours
        shutil.rmtree(tmp, ignore_errors=True)
    return final_path
