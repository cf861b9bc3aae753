"""Shared versioned-store commit layer: ordered commit log over a
pluggable put-if-absent primitive.

Every durable artifact this engine publishes — TableStore tables
(``storage.py``), the MinHash dedup index (``operators/dedup.py``),
the LSH/IVF ANN indexes (``operators/similarity.py``) — follows the
same discipline: land immutable data in a fresh version directory,
then make it live with a metadata commit. Before round 8 each store
re-implemented that discipline as pointer-file + ``os.replace``,
which is atomic on POSIX but has NO analog on S3/GCS where a 100-TB
deployment actually lives (object stores don't rename; "rename" is
copy+delete and readers can observe the gap). This module replaces
the three copies with one layer built on the primitive object stores
DO provide:

    put_if_absent(path, data) -> bool

— create-exclusive with full-content visibility. On S3 that is a
conditional PUT (``If-None-Match: *``, atomic since the 2024 API
addition; S3 has been strongly consistent since 2020), on GCS a
precondition ``ifGenerationMatch=0``, on POSIX ``os.link`` from a
private temp file (link is atomic and fails EEXIST; the content is
complete before the name appears). Everything else — CAS, ordering,
torn-write tolerance, time travel — derives from that one primitive
via a Delta-style ordered commit log (PAPERS.md: Armbrust et al.,
"Delta Lake: High-Performance ACID Table Storage over Cloud Object
Stores", VLDB 2020 — the log-is-the-truth design, not the code).

Log layout under ``{root}/_commits/``::

    00000000000000000001.json   {"path": ".../v...", "committed_at": ...}
    00000000000000000002.json   ...

The highest parseable sequence is the current version. Writers race
by attempting ``put_if_absent`` at ``head+1``: exactly one wins;
with ``expected=`` the loser gets :class:`CommitConflict` (the CAS
the append/rebuild maintenance paths need), without it the loser
re-reads and retries at the new head+1.

Crash anatomy (the fault-injection tests pin each case):

* crash AFTER data write, BEFORE commit → an orphan version dir the
  log never references; readers keep resolving the old commit;
  vacuum reclaims the orphan later.
* torn/partial commit object (a backend without atomic visibility,
  or a half-uploaded multipart PUT) → unparseable entries are
  never-committed: resolution takes the highest PARSEABLE entry, so
  a torn tail only delays visibility and can never serve bad data.
  New commits always sequence ABOVE the torn names so stuck garbage
  objects can't block writes.
* duplicate publish attempt after a lost ACK → ``put_if_absent``
  fails EEXIST, writer re-reads and re-sequences; no commit is ever
  overwritten (commit objects are immutable once visible).
"""

from __future__ import annotations

import json
import os
import time
import uuid


class CommitConflict(RuntimeError):
    """A CAS commit lost: the log head moved past ``expected``.

    The caller's version-derived work (an append into a specific
    version's directories, a compaction of a specific snapshot) may
    now be stranded in a superseded version — re-resolve the current
    version and redo the work against it; never retry the commit
    blind."""


#: sentinel for commit(expected=ANY): no CAS, retry past losers.
ANY = object()


class CommitBackend:
    """Minimal storage contract the commit log needs. Implementations
    must make :meth:`put_if_absent` atomic: the name appears with its
    FULL content or not at all, and concurrent puts of the same name
    have exactly one winner."""

    def put_if_absent(self, path: str, data: bytes) -> bool:
        raise NotImplementedError

    def read(self, path: str) -> bytes | None:
        raise NotImplementedError

    def list_dir(self, dirpath: str) -> list[str]:
        """Names (not paths) of entries in ``dirpath``; [] if absent."""
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError


class PosixBackend(CommitBackend):
    """Local-filesystem backend: put-if-absent via ``os.link`` from a
    private temp file. ``link(2)`` is atomic, fails ``EEXIST`` when
    the target name is taken, and the target appears only after the
    temp file's content is fully written+fsynced — the same
    guarantees a conditional PUT gives on an object store, built
    WITHOUT rename so the protocol stays honest about what a cloud
    deployment can rely on."""

    def put_if_absent(self, path: str, data: bytes) -> bool:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".put.{uuid.uuid4().hex}.tmp")
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def read(self, path: str) -> bytes | None:
        try:
            with open(path, "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None

    def list_dir(self, dirpath: str) -> list[str]:
        try:
            return os.listdir(dirpath)
        except FileNotFoundError:
            return []

    def delete(self, path: str) -> None:
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass


class MemoryBackend(CommitBackend):
    """In-memory reference backend: a dict and a put-if-absent. Ships
    as the executable spec of the object-store seam — it supports NO
    rename/replace at all, so any store that passes its tests against
    this backend provably never needed POSIX atomicity for its
    METADATA path (parquet data still lands on the real filesystem;
    only commits route through the backend)."""

    def __init__(self):
        self.objects: dict[str, bytes] = {}

    def put_if_absent(self, path: str, data: bytes) -> bool:
        if path in self.objects:
            return False
        self.objects[path] = data
        return True

    def read(self, path: str) -> bytes | None:
        return self.objects.get(path)

    def list_dir(self, dirpath: str) -> list[str]:
        prefix = dirpath.rstrip("/") + "/"
        return sorted(
            {
                p[len(prefix):].split("/", 1)[0]
                for p in self.objects
                if p.startswith(prefix)
            }
        )

    def delete(self, path: str) -> None:
        self.objects.pop(path, None)


_SEQ_WIDTH = 20

_DEFAULT_BACKEND: CommitBackend | None = None


def set_default_backend(backend: CommitBackend | None) -> None:
    """Install the process-wide commit backend for every store whose
    caller didn't pass one explicitly — TableStore tables, the MinHash
    index, the LSH/IVF ANN indexes. This is the one-line cloud switch:
    a deployment constructs its conditional-PUT S3/GCS backend once at
    startup and every versioned store in the engine publishes through
    it; ``None`` restores the POSIX default. Resolution is late (at
    each store handle's construction), so the order of imports doesn't
    matter."""
    global _DEFAULT_BACKEND
    _DEFAULT_BACKEND = backend


def default_backend() -> CommitBackend:
    """The backend used when none is passed: the installed process
    default, else :class:`PosixBackend`."""
    return _DEFAULT_BACKEND or PosixBackend()


class CommitLog:
    """Ordered commit log in ``dirpath``: zero-padded ``{seq}.json``
    entries, highest parseable seq wins."""

    def __init__(self, dirpath: str, backend: CommitBackend | None = None):
        self.dir = dirpath
        self.backend = backend or default_backend()

    def _entry_path(self, seq: int) -> str:
        return os.path.join(self.dir, f"{seq:0{_SEQ_WIDTH}d}.json")

    def _entries(self) -> list[int]:
        out = []
        for name in self.backend.list_dir(self.dir):
            stem = name[:-5] if name.endswith(".json") else None
            if stem and stem.isdigit():
                out.append(int(stem))
        return sorted(out)

    def _load(self, seq: int) -> dict | None:
        raw = self.backend.read(self._entry_path(seq))
        if raw is None:
            return None
        try:
            return json.loads(raw.decode("utf-8"))
        except (ValueError, UnicodeDecodeError):
            return None

    def head(self) -> tuple[int, dict] | None:
        """(seq, payload) of the newest COMMITTED entry — the highest
        PARSEABLE one — or None.

        Torn entries (unparseable bytes: a writer died mid-publish on
        a backend without atomic visibility, or a half-uploaded
        multipart PUT) are treated as never-committed. They can only
        accumulate as a contiguous tail above the last real commit —
        each crashed writer sequences above everything listed,
        including earlier garbage — so skipping down to the first
        parseable entry is exactly "ignore the in-flight publishes
        that never completed", the Delta-style fail-closed rule.
        Resolution never moves FORWARD past a valid commit; a torn
        entry can only ever delay visibility, not serve bad data."""
        for seq in reversed(self._entries()):
            payload = self._load(seq)
            if payload is not None:
                return seq, payload
        return None

    def history(self) -> list[tuple[int, dict]]:
        """All parseable commits, oldest first."""
        out = []
        for seq in self._entries():
            p = self._load(seq)
            if p is not None:
                out.append((seq, p))
        return out

    def commit(self, payload: dict, expected=ANY, max_attempts: int = 50) -> int:
        """Append ``payload`` as the next commit; returns its seq.

        ``expected=ANY`` → unconditional: losing the put race re-reads
        the head and retries above it. ``expected=None`` → the log
        must be empty (first-commit-wins init). ``expected=<seq>`` →
        CAS: the head must still be ``<seq>`` at the winning put, else
        :class:`CommitConflict`. The CAS is enforced BY the
        put-if-absent itself — the commit claims seq ``expected+1``
        and a winner at that name proves no other commit sequenced in
        between — so there is no check-then-act window."""
        data = json.dumps(dict(payload, committed_at=time.time())).encode()
        if expected is not ANY:
            head_seq = expected if expected is not None else 0
            cur = self._entries()
            if (cur and cur[-1] != head_seq) or (not cur and head_seq != 0):
                raise CommitConflict(
                    f"commit log {self.dir}: expected head "
                    f"{expected}, found {cur[-1] if cur else None}"
                )
            if self.backend.put_if_absent(self._entry_path(head_seq + 1), data):
                return head_seq + 1
            raise CommitConflict(
                f"commit log {self.dir}: lost the race for seq "
                f"{head_seq + 1} (expected head {expected})"
            )
        for _ in range(max_attempts):
            seqs = self._entries()
            nxt = (seqs[-1] if seqs else 0) + 1
            if self.backend.put_if_absent(self._entry_path(nxt), data):
                return nxt
        raise CommitConflict(
            f"commit log {self.dir}: gave up after {max_attempts} "
            "contended attempts"
        )

    def prune(self, below_seq: int) -> list[int]:
        """Delete log entries (parseable or torn) with seq strictly
        below ``below_seq``; returns the removed seqs.

        Why this exists: a streaming MERGE commits every micro-batch,
        so an unbounded log turns :meth:`head` into an unbounded LIST
        — the real cost ceiling on an object store, where listings
        page at ~1000 keys. Pruning entries that no retained version
        needs keeps resolution O(retained versions), the same way
        Delta's checkpoints bound its log replay. The head is never
        prunable: ``below_seq`` is clamped to the current head seq, so
        an over-eager caller can empty the history but never the
        pointer."""
        head = self.head()
        if head is not None:
            below_seq = min(below_seq, head[0])
        removed = []
        for seq in self._entries():
            if seq < below_seq:
                self.backend.delete(self._entry_path(seq))
                removed.append(seq)
        return removed


class VersionedStore:
    """Version directories + commit log + retention: the shared layer
    behind TableStore tables, the MinHash index, and the LSH/IVF
    indexes (reference analog: the Postgres tables + snapshot
    retention the reference leans on, e.g.
    rialto_airflow/publish/publication.py:91-95).

    * :meth:`new_version_path` names a fresh immutable version dir —
      write data there with Spark, then :meth:`commit` it.
    * :meth:`current` resolves the live version (legacy single-file
      pointers from the pre-log layout still resolve, read-only).
    * :meth:`restore` is just another commit pointing at an old dir.
    * :meth:`vacuum` reclaims superseded/orphaned version dirs by
      count and/or age, never the current one.

    Only COMMITS route through the backend; version-dir data is
    written by Spark directly (on a cluster that's the
    FileOutputCommitter/cloud committer's job). Version dirs are
    never mutated after commit, so readers that resolved a version
    keep a consistent snapshot for as long as retention allows.
    """

    LOG_DIR = "_commits"

    def __init__(
        self,
        root: str,
        backend: CommitBackend | None = None,
        version_prefix: str = "v",
        legacy_pointer: str | None = None,
    ):
        self.root = root
        self.backend = backend or default_backend()
        self.version_prefix = version_prefix
        self.legacy_pointer = legacy_pointer
        self.log = CommitLog(os.path.join(root, self.LOG_DIR), self.backend)

    # -- write side -------------------------------------------------
    def new_version_path(self) -> str:
        """Fresh version dir name: ms-timestamp prefix (lexicographic
        order ≈ commit order for humans; the LOG is the authority) +
        uuid suffix (concurrent writers never collide)."""
        version = (
            f"{self.version_prefix}{int(time.time() * 1000)}"
            f"-{uuid.uuid4().hex[:8]}"
        )
        return os.path.join(self.root, version)

    def commit(self, path: str, extra: dict | None = None, expected=ANY) -> int:
        payload = dict(extra or {}, path=path)
        return self.log.commit(payload, expected=expected)

    # -- read side --------------------------------------------------
    def current(self) -> dict | None:
        """Payload of the live commit (carries at least ``path`` and
        ``committed_at``), or the legacy pointer's payload, or None."""
        head = self.log.head()
        if head is not None:
            return head[1]
        if self.legacy_pointer:
            raw = PosixBackend().read(self.legacy_pointer)
            if raw is not None:
                return json.loads(raw.decode("utf-8"))
        return None

    def current_path(self) -> str | None:
        cur = self.current()
        return cur["path"] if cur else None

    def current_seq(self) -> int | None:
        """Head seq for CAS commits; None on an empty/legacy-only log."""
        head = self.log.head()
        return head[0] if head else None

    # -- history / retention ---------------------------------------
    def _version_dirs(self) -> list[str]:
        # version DATA always lives on the executing filesystem (Spark
        # writes it); only COMMITS route through the backend — so this
        # listing is os-level on purpose, even under MemoryBackend.
        try:
            names = os.listdir(self.root)
        except FileNotFoundError:
            return []
        return sorted(
            d
            for d in names
            if not d.startswith(("_", "."))
            and d.startswith(self.version_prefix)
            and os.path.isdir(os.path.join(self.root, d))
        )

    def versions(self) -> list[dict]:
        """Retained version dirs, commit order (first-commit seq; a
        restore re-commits an old path but doesn't reorder it).
        Orphan dirs — data written, never committed — sort first and
        carry ``committed: False``."""
        first_seq: dict[str, int] = {}
        for seq, payload in self.log.history():
            p = payload.get("path")
            if p and p not in first_seq:
                first_seq[p] = seq
        current = self.current_path()
        out = []
        for name in self._version_dirs():
            p = os.path.join(self.root, name)
            out.append(
                {
                    "version": name,
                    "path": p,
                    "current": bool(
                        current
                        and os.path.abspath(p) == os.path.abspath(current)
                    ),
                    "committed": p in first_seq
                    or bool(
                        current
                        and os.path.abspath(p) == os.path.abspath(current)
                    ),
                }
            )
        out.sort(
            key=lambda v: (
                v["path"] in first_seq,
                first_seq.get(v["path"], 0),
                v["version"],
            )
        )
        return out

    def restore(self, version: str) -> str:
        p = os.path.join(self.root, version)
        if not os.path.isdir(p):
            raise FileNotFoundError(
                f"{self.root} has no retained version {version!r} "
                "(vacuumed, or never committed)"
            )
        self.commit(p, extra={"restored": True})
        return p

    def _version_committed_at(self, path: str) -> float | None:
        """When ``path`` FIRST went live, from the log; legacy dirs
        fall back to the ms timestamp embedded in the dir name."""
        for _seq, payload in self.log.history():
            if payload.get("path") == path:
                ts = payload.get("committed_at")
                if ts is not None:
                    return float(ts)
        name = os.path.basename(path)
        if self.version_prefix and name.startswith(self.version_prefix):
            name = name[len(self.version_prefix):]
        stem = name.split("-", 1)[0]
        return int(stem) / 1000.0 if stem.isdigit() else None

    def vacuum(
        self, keep: int = 2, older_than_s: float | None = None
    ) -> list[str]:
        """Reclaim version dirs: all but the newest ``keep`` (0 =
        count-unbounded), and — when ``older_than_s`` is given — only
        those whose commit is at least that old (never-committed
        orphans age by their embedded write timestamp). The CURRENT
        version is never reclaimed, whatever the thresholds.

        Retention IS the snapshot-consistency contract: a reader that
        resolved a version keeps reading it consistently until vacuum;
        pick ``older_than_s`` ≥ the longest query/probe lifetime (the
        reference keeps 30 days of snapshots — README.md:31)."""
        import shutil

        vs = self.versions()
        current = self.current_path()
        cutoff = time.time() - older_than_s if older_than_s is not None else None
        removed = []
        candidates = vs[:-keep] if keep else vs
        for v in candidates:
            p = v["path"]
            if current and os.path.abspath(p) == os.path.abspath(current):
                continue
            if cutoff is not None:
                ts = self._version_committed_at(p)
                if ts is not None and ts > cutoff:
                    continue
            shutil.rmtree(p, ignore_errors=True)
            removed.append(p)

        # Bound the LOG by the same retention: entries no retained
        # version needs are dead metadata, and a streaming writer
        # (one commit per micro-batch) otherwise grows the log — and
        # head()'s LIST — without bound. Keep every entry from the
        # first commit of the oldest RETAINED dir onward so retained
        # versions keep their committed_at lineage; prune() clamps to
        # the head, so the live pointer is never touched.
        if removed:
            retained = {
                os.path.abspath(v["path"])
                for v in self.versions()
            }
            first_seq = [
                seq
                for seq, payload in self.log.history()
                if payload.get("path")
                and os.path.abspath(payload["path"]) in retained
            ]
            if first_seq:
                self.log.prune(min(first_seq))
        return removed
