"""Shared freshness/atomicity helpers for derived test-fixture directories.

The WARC/CDX fixture writers derive shard files in /tmp as a pure function
of ``{sf_dir}/documents.parquet``. A bare ``_DONE`` sentinel has two
failure modes the helpers below close:

- staleness: regenerating documents.parquet (or pointing a different
  dataset at a directory with the same basename) left the old shards in
  place while the DuckDB oracle recomputed fresh from the table — a false
  driver-gate failure. The sentinel therefore stores a CONTENT KEY
  (source size + mtime + shard count) and is only honored when it matches.
- partial reads under concurrency: two processes racing past the sentinel
  check could let one ``spark.read`` a half-written shard. Shards are
  written to a ``.tmp-{pid}`` name that the readers' ``*.gz`` glob cannot
  match, then atomically ``os.replace``d into place; concurrent writers
  produce byte-identical files (the derivation is deterministic), so any
  interleaving of replaces yields a consistent directory.
"""

from __future__ import annotations

import os


def fixture_key(sf_dir: str, n_files: int) -> str:
    st = os.stat(os.path.join(sf_dir, "documents.parquet"))
    return f"{st.st_size}:{st.st_mtime_ns}:{n_files}"


def fixture_fresh(out_dir: str, key: str) -> bool:
    try:
        with open(os.path.join(out_dir, "_DONE")) as f:
            return f.read().strip() == key
    except OSError:
        return False


def mark_fixture_done(out_dir: str, key: str) -> None:
    done = os.path.join(out_dir, "_DONE")
    tmp = f"{done}.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(key + "\n")
    os.replace(tmp, done)


def atomic_path(final_path: str) -> tuple[str, str]:
    """(tmp_path, final_path) for write-then-``os.replace`` publication."""
    return f"{final_path}.tmp-{os.getpid()}", final_path


def prune_orphans(out_dir: str, suffix: str, keep: set[str]) -> None:
    """Delete reader-visible shards (``*{suffix}``) that a rewrite did not
    produce — without this, shrinking ``n_files`` (or a prior run's extra
    files) leaves stale shards that the readers' glob happily ingests
    alongside the fresh ones. ``.tmp-*`` leftovers from CRASHED runs are
    swept too, but only when an hour old: a younger tmp may be a
    concurrent writer's in-flight file whose os.replace must not lose a
    race with our remover."""
    import time

    now = time.time()
    for name in os.listdir(out_dir):
        path = os.path.join(out_dir, name)
        if name.endswith(suffix) and name not in keep:
            stale = True
        elif ".tmp-" in name:
            try:
                stale = now - os.path.getmtime(path) > 3600
            except OSError:  # pragma: no cover - already gone
                stale = False
        else:
            stale = False
        if stale:
            try:
                os.remove(path)
            except OSError:  # pragma: no cover - concurrent remover won
                pass
