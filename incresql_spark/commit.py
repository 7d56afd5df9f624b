"""Storage commit backends — the single seam every state transaction
funnels through.

Both storage layers (``frequency.FreqTable`` segments and
``materialize.AggState`` bucket manifests) reduce every transaction to ONE
atomic publication:

- a *segment* becomes visible exactly when its ``_segmeta.json`` marker
  exists inside a ``seg-*`` directory (readers ignore unmarked dirs), and
- an AggState generation becomes current exactly when its manifest is the
  latest one ``load_manifest`` returns.

How that publication is made atomic is a property of the underlying store,
not of the engine — so it lives behind ``CommitBackend``:

``RenameCommitBackend`` (default)
    POSIX atomic rename / replace.  Correct on local disks and HDFS-class
    filesystems: segments are staged in a dot-prefixed scratch directory
    and renamed into place with the marker already inside; manifests are
    version-named files published with ``os.replace``.

``CasPointerCommitBackend``
    For S3-class object stores, where rename is copy+delete and two
    writers can interleave.  No rename is ever issued: segment parquet is
    written directly under its final key prefix and committed by a single
    marker-object PUT (single-object PUT is atomic on every major object
    store); manifests are written under content-unique keys and the ONLY
    atomic step is advancing one small pointer with compare-and-swap
    (S3 conditional PUT ``If-None-Match``, or DynamoDB/ZooKeeper).  The
    local mock implements the CAS with ``O_CREAT|O_EXCL`` on a
    version-numbered pointer file: exactly one writer can create
    ``ptr-N`` — the loser gets ``CommitConflict`` and the state is left
    exactly as the winner published it.

Select per session with ``incresql.commit.backend`` = ``rename`` (default)
| ``cas``, or pass a backend instance to ``FreqTable`` / ``AggState``.

Single-writer fencing (``WriterFence``) rides on the same primitive: a
writer acquires a monotonically increasing epoch (``O_EXCL`` create of
``_fence/epoch-N``); every commit re-checks that no higher epoch exists
and raises ``WriterFenced`` otherwise.  A takeover therefore fences the
previous writer LOUDLY at its next commit instead of silently interleaving
segment sequence numbers — and a crashed writer never leaves a stale lock
that bricks the directory (there is nothing to expire: the next writer
just acquires the next epoch).

Reference parity note: the reference engine is single-node RocksDB
(storage/src/storage.rs) — it has no object-store or multi-writer story;
this module is beyond-reference scope required by the 100 TB deployment
target documented in SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

BACKEND_CONF = "incresql.commit.backend"

_SEGMETA = "_segmeta.json"


class CommitConflict(RuntimeError):
    """Another writer committed the same version first; this transaction
    was NOT applied and the published state is the winner's."""


class WriterFenced(RuntimeError):
    """A newer writer epoch exists for this state directory; this writer
    must stop — continuing would interleave commits with the new owner."""


class RenameCommitBackend:
    """POSIX atomic-rename publication (the default; matches the local and
    HDFS deployment)."""

    name = "rename"

    # -- segments ------------------------------------------------------------
    def segment_sink(self, table_path: str, seg_name: str) -> str:
        """Directory the writer should produce the segment parquet into.
        Dot-prefixed so directory listings of ``seg-*`` never see it."""
        return os.path.join(table_path, f".stage-{seg_name}")

    def seal_segment(self, table_path: str, seg_name: str, meta: dict) -> None:
        """Atomically publish the staged segment: the marker is written
        INTO the stage first, then one rename makes dir + marker visible
        together."""
        sink = self.segment_sink(table_path, seg_name)
        with open(os.path.join(sink, _SEGMETA), "w") as fh:
            json.dump(meta, fh)
        os.rename(sink, os.path.join(table_path, seg_name))

    def clean_stale_segments(self, table_path: str) -> None:
        """Reclaim scratch left by crashed writers: ``.stage-*`` dirs were
        never visible (the rename is the commit point); legacy
        ``compact-*`` tmps likewise; and a marker-less ``seg-*`` dir can
        only be pre-seam garbage (a crash of the old write path between
        parquet and segmeta) — invisible to readers either way."""
        for name in os.listdir(table_path):
            p = os.path.join(table_path, name)
            if name.startswith(".stage-") or name.startswith("compact-"):
                shutil.rmtree(p, ignore_errors=True)
            elif (name.startswith("seg-") and os.path.isdir(p)
                    and not os.path.exists(os.path.join(p, _SEGMETA))):
                shutil.rmtree(p, ignore_errors=True)

    def place_dir(self, src: str, dst: str) -> None:
        """Move a data directory to its final name.  Used only for objects
        nothing references yet (AggState bucket versions before their
        manifest commits), so atomicity is not required — but rename is
        free here."""
        os.replace(src, dst)

    # -- manifests -----------------------------------------------------------
    def manifest_versions(self, state_path: str) -> list[int]:
        if not os.path.isdir(state_path):
            return []
        return sorted(
            int(f[len("manifest-"):-len(".json")])
            for f in os.listdir(state_path)
            if f.startswith("manifest-") and f.endswith(".json")
        )

    def load_manifest(self, state_path: str) -> dict | None:
        vs = self.manifest_versions(state_path)
        if not vs:
            return None
        with open(os.path.join(state_path, f"manifest-{vs[-1]}.json")) as fh:
            return json.load(fh)

    def publish_manifest(self, state_path: str, version: int,
                         payload: dict) -> None:
        tmp = os.path.join(state_path, f".manifest-{version}.tmp")
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
        os.replace(tmp, os.path.join(state_path, f"manifest-{version}.json"))

    def retire_manifests(self, state_path: str, keep: int = 2) -> None:
        """Retain exactly ``keep`` newest generations (debug/time-travel)."""
        for v in self.manifest_versions(state_path)[:-keep]:
            os.unlink(os.path.join(state_path, f"manifest-{v}.json"))


class CasPointerCommitBackend:
    """Manifest-pointer commit for stores without atomic rename.

    Local mock of the object-store protocol: plain writes stand in for
    object PUTs (single-object PUT is atomic), and ``O_CREAT|O_EXCL``
    creation of a version-numbered pointer file stands in for conditional
    PUT — the compare-and-swap that makes exactly one writer win a
    version.  Nothing in this class calls ``os.rename``/``os.replace``.
    """

    name = "cas"

    # -- segments ------------------------------------------------------------
    def segment_sink(self, table_path: str, seg_name: str) -> str:
        """Parquet goes straight under the final key prefix — invisible to
        readers until the marker object exists (``FreqTable._segments``
        skips unmarked dirs)."""
        return os.path.join(table_path, seg_name)

    def seal_segment(self, table_path: str, seg_name: str, meta: dict) -> None:
        """Commit = one marker-object PUT, created exclusively: a duplicate
        seal of the same segment name is a conflict, not a silent
        overwrite."""
        marker = os.path.join(table_path, seg_name, _SEGMETA)
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as exc:
            raise CommitConflict(
                f"segment {seg_name} already sealed by another writer"
            ) from exc
        with os.fdopen(fd, "w") as fh:
            json.dump(meta, fh)

    def clean_stale_segments(self, table_path: str) -> None:
        """Unmarked ``seg-*`` dirs (crashed before their marker PUT) are
        invisible to readers; reclaim them here.  Never touches marked
        segments."""
        for name in os.listdir(table_path):
            p = os.path.join(table_path, name)
            if (name.startswith("seg-") and os.path.isdir(p)
                    and not os.path.exists(os.path.join(p, _SEGMETA))):
                shutil.rmtree(p, ignore_errors=True)
            elif name.startswith("compact-"):
                shutil.rmtree(p, ignore_errors=True)

    def place_dir(self, src: str, dst: str) -> None:
        """Object stores have no rename — this is the copy+delete a real
        deployment's server-side COPY performs.  Safe ONLY because the
        destination objects are unreferenced until the manifest pointer
        commits (the one atomic step); a crash mid-copy leaves garbage the
        next refresh's reclaim pass removes."""
        shutil.copytree(src, dst)
        shutil.rmtree(src, ignore_errors=True)

    # -- manifests -----------------------------------------------------------
    def _ptr_dir(self, state_path: str) -> str:
        return os.path.join(state_path, "_ptr")

    def manifest_versions(self, state_path: str) -> list[int]:
        d = self._ptr_dir(state_path)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(f[len("ptr-"):]) for f in os.listdir(d)
            if f.startswith("ptr-")
        )

    def load_manifest(self, state_path: str) -> dict | None:
        vs = self.manifest_versions(state_path)
        if not vs:
            return None
        with open(os.path.join(self._ptr_dir(state_path),
                               f"ptr-{vs[-1]}")) as fh:
            obj = fh.read().strip()
        with open(os.path.join(state_path, obj)) as fh:
            return json.load(fh)

    def publish_manifest(self, state_path: str, version: int,
                         payload: dict) -> None:
        """Write the manifest under a content-unique key (plain PUT), then
        CAS the pointer.  The loser's manifest object is removed; the
        winner's state is untouched."""
        obj = f"mobj-{version}-{uuid.uuid4().hex[:8]}.json"
        with open(os.path.join(state_path, obj), "w") as fh:
            json.dump(payload, fh)
        ptr_dir = self._ptr_dir(state_path)
        os.makedirs(ptr_dir, exist_ok=True)
        ptr = os.path.join(ptr_dir, f"ptr-{version}")
        # CAS with content-atomicity: the pointer appears with its target
        # name already inside (a real conditional PUT is atomic with its
        # body; an O_EXCL create + separate write would leave a torn empty
        # pointer if the writer died in between).  hard-link is
        # create-if-absent, not a rename.
        src = os.path.join(ptr_dir, f".ptr-{version}-{uuid.uuid4().hex[:8]}")
        with open(src, "w") as fh:
            fh.write(obj)
        try:
            os.link(src, ptr)
        except FileExistsError as exc:
            os.unlink(os.path.join(state_path, obj))
            raise CommitConflict(
                f"manifest version {version} was committed by another "
                f"writer; re-read the state and retry"
            ) from exc
        finally:
            os.unlink(src)

    def retire_manifests(self, state_path: str, keep: int = 2) -> None:
        if not os.path.isdir(self._ptr_dir(state_path)):
            return
        vs = self.manifest_versions(state_path)
        live: set[str] = set()
        for v in vs[-keep:]:
            with open(os.path.join(self._ptr_dir(state_path),
                                   f"ptr-{v}")) as fh:
                live.add(fh.read().strip())
        for v in vs[:-keep]:
            os.unlink(os.path.join(self._ptr_dir(state_path), f"ptr-{v}"))
        for name in os.listdir(self._ptr_dir(state_path)):
            if name.startswith(".ptr-"):  # torn CAS scratch of a crashed writer
                os.unlink(os.path.join(self._ptr_dir(state_path), name))
        for name in os.listdir(state_path):
            if name.startswith("mobj-") and name not in live:
                os.unlink(os.path.join(state_path, name))


_BACKENDS = {
    "rename": RenameCommitBackend,
    "cas": CasPointerCommitBackend,
}


def backend_for(spark) -> RenameCommitBackend | CasPointerCommitBackend:
    """Session-selected backend (``incresql.commit.backend``)."""
    name = spark.conf.get(BACKEND_CONF, "rename")
    try:
        return _BACKENDS[name]()
    except KeyError:
        raise ValueError(
            f"unknown {BACKEND_CONF} {name!r}; expected one of "
            f"{sorted(_BACKENDS)}"
        ) from None


class WriterFence:
    """Epoch-based single-writer fence for one state directory.

    ``acquire`` takes the next epoch with an exclusive create; ``check``
    raises ``WriterFenced`` once any higher epoch exists.  Commit paths
    call ``check`` immediately before their atomic publication, so a
    fenced writer fails loudly BEFORE adding a segment/manifest the new
    owner doesn't know about.  (The check-then-publish pair is not itself
    atomic — on rename filesystems that residual race is closed by flock
    on the epoch file in a real deployment; the epoch discipline already
    turns silent interleaving into a loud error, which is the contract
    documented in SCALING.md.)
    """

    def __init__(self, path: str, epoch: int):
        self.path = path
        self.epoch = epoch

    @staticmethod
    def _dir(path: str) -> str:
        return os.path.join(path, "_fence")

    @classmethod
    def acquire(cls, path: str) -> "WriterFence":
        d = cls._dir(path)
        os.makedirs(d, exist_ok=True)
        while True:
            nxt = max(
                (int(f[len("epoch-"):]) for f in os.listdir(d)
                 if f.startswith("epoch-")),
                default=-1,
            ) + 1
            try:
                fd = os.open(os.path.join(d, f"epoch-{nxt}"),
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                continue  # another writer raced to this epoch; take the next
            with os.fdopen(fd, "w") as fh:
                fh.write(str(os.getpid()))
            return cls(path, nxt)

    def check(self) -> None:
        d = self._dir(self.path)
        newest = max(
            (int(f[len("epoch-"):]) for f in os.listdir(d)
             if f.startswith("epoch-")),
            default=-1,
        )
        if newest > self.epoch:
            raise WriterFenced(
                f"writer epoch {self.epoch} fenced by epoch {newest} on "
                f"{self.path} — a newer writer owns this state directory"
            )


def write_json_atomic(path: str, obj: dict) -> None:
    """Publish a small JSON control file (catalog, table schema, geometry
    pin, MV meta) via write-then-rename: a crash mid-write leaves the old
    file (or none), never a truncated document that would make every
    subsequent open die in ``json.load``.  On object stores a single PUT
    is already atomic with its body — this is the local-filesystem analog,
    so control files need no backend dispatch."""
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(obj, fh)
    os.replace(tmp, path)
