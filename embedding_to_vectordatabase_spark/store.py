"""Versioned-relation manifests: atomic multi-relation store
mutations without a table format (r15 verdict #4).

A persisted index (or a client collection root) is a directory of
parquet RELATIONS (``codes``, ``centroids``, ``postings``, ...).
The append-only lifecycle never needed atomicity — upserts add
segments to one relation and at-least-once duplication is tolerated
by contract. The MAINTENANCE tier does: ``compact_index`` /
``delete_from_index`` / ``rebalance_ivfsq8_index`` / the client's
``delete`` rewrite SEVERAL relations whose contents must be read as
a consistent pair (codes+centroids, postings+df_stats, collection+
index), and the old FS-rename swap (``_swap_dirs``) exposed two
windows per relation times N relations per mutation.

The fix is the standard lake-format move, minimally: relation data
lives in VERSIONED directories (``codes.v<token>.parquet``), and a
tiny JSON manifest under ``<root>/_manifest/`` maps relation name →
current directory. One mutation = stage every rewritten relation to
a fresh versioned dir, then publish ONE manifest file. The publish
is a single FS ``create``+``rename`` to a brand-new name — atomic on
HDFS and posix — so a reader resolving through the manifest sees the
whole mutation or none of it, never a mixed pair.

Compatibility contract (keeps ~90 existing call sites and on-disk
stores working unchanged):

- no manifest dir, or a relation absent from the mapping → the
  LEGACY path ``<root>/<rel>.parquet``. Every store built before
  this layer resolves exactly as before.
- ``rel_path`` is the single resolution point for readers AND
  appending writers; multi-relation operations may load the manifest
  once (``load_manifest``) and pass it to every ``rel_path`` call so
  all their resolutions come from the same snapshot.
- GC grace: publishing generation N deletes versioned dirs that the
  previous TWO manifests no longer reference, so a reader holding
  generation N-1 paths (a running Spark job planned before the
  publish) keeps reading files that still exist. Single-maintainer
  contract (the same offline-maintenance scope the mutators already
  document); concurrent READERS are the ones the layer protects.
"""

from __future__ import annotations

import functools
import inspect
import json
import threading
import uuid
from contextlib import contextmanager

_MANIFEST_DIR = "_manifest"
_KEEP_MANIFESTS = 8  # bounded history; GC grace needs only 2
_PIN = threading.local()


def _jpath(spark, path: str):
    return spark._jvm.org.apache.hadoop.fs.Path(path)


def _fs(spark, path: str):
    p = _jpath(spark, path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def _list_manifests(spark, root: str) -> list[str]:
    """Sorted manifest file names (ascending seq) under the root;
    empty when the store predates the manifest layer."""
    fs, p = _fs(spark, f"{root}/{_MANIFEST_DIR}")
    if not fs.exists(p):
        return []
    names = []
    for st in fs.listStatus(p):
        nm = st.getPath().getName()
        if nm.startswith("m") and nm.endswith(".json"):
            names.append(nm)
    return sorted(names)


def _read_manifest_file(spark, root: str, name: str) -> dict:
    # BufferedReader line loop: works on every Hadoop FS (ByteBuffer
    # reads don't — ChecksumFileSystem lacks ByteBufferReadable), and
    # stays a driver-side metadata read, never a Spark job
    jvm = spark._jvm
    fs, p = _fs(spark, f"{root}/{_MANIFEST_DIR}/{name}")
    reader = jvm.java.io.BufferedReader(
        jvm.java.io.InputStreamReader(fs.open(p), "UTF-8")
    )
    try:
        lines = []
        while True:
            line = reader.readLine()
            if line is None:
                break
            lines.append(line)
    finally:
        reader.close()
    return json.loads("\n".join(lines))


def load_manifest(spark, root: str) -> dict:
    """The CURRENT relation→dirname mapping (empty dict when the
    store has no manifest). Load once per multi-relation operation
    and pass to every ``rel_path`` so the operation's resolutions are
    one consistent snapshot."""
    names = _list_manifests(spark, root)
    if not names:
        return {}
    return _read_manifest_file(spark, root, names[-1]).get("rels", {})


def rel_path(spark, root: str, rel: str, mf: dict | None = None) -> str:
    """Resolve a relation to its current directory: the manifest
    mapping when present, else the legacy ``<root>/<rel>.parquet``."""
    if mf is None:
        mf = load_manifest(spark, root)
    return f"{root}/{mf.get(rel, rel + '.parquet')}"


def current_rel(root: str, rel: str, mf: dict | None = None) -> str:
    """``rel_path`` with the session derived from the active
    SparkSession — every resolution site is driver-side plan-build
    code, where an active session always exists; this keeps the ~90
    call sites a one-expression change from the legacy f-string.
    Inside a ``pinned_manifest`` scope (every search/probe entry
    point), the pinned snapshot wins, so a multi-relation read never
    straddles a concurrent publish."""
    from pyspark.sql import SparkSession

    if mf is None:
        mf = getattr(_PIN, "pins", {}).get(root)
    spark = SparkSession.getActiveSession()
    if spark is None:
        # no active session (e.g. a bare-path utility call before any
        # DataFrame exists): a store without a manifest resolves
        # legacy anyway, and one WITH a manifest can't be read
        # without a session either
        return f"{root}/{rel}.parquet" if mf is None else (
            f"{root}/{mf.get(rel, rel + '.parquet')}"
        )
    return rel_path(spark, root, rel, mf)


@contextmanager
def pinned_manifest(spark, root: str):
    """Pin ONE manifest snapshot for ``root`` on this thread: every
    ``current_rel`` call inside the scope resolves from it. Searches
    read 2–4 relations that mutations rewrite as a group (codes+
    centroids, postings+df_stats+corpus_stats, bands+signatures);
    without the pin, per-call resolution leaves a microsecond window
    where two reads straddle a publish."""
    pins = getattr(_PIN, "pins", None)
    if pins is None:
        pins = _PIN.pins = {}
    had, prev = root in pins, pins.get(root)
    pins[root] = load_manifest(spark, root)
    try:
        yield pins[root]
    finally:
        if had:
            pins[root] = prev
        else:
            pins.pop(root, None)


def pin_index_path(fn):
    """Decorator for store-reading entry points taking an
    ``index_path`` argument: runs the body under ``pinned_manifest``
    so every relation it opens comes from one manifest generation.
    The returned (lazy) DataFrame is safe — paths are baked into the
    plan at construction time, inside the pin."""
    sig = inspect.signature(fn)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        from pyspark.sql import SparkSession

        try:
            bound = sig.bind_partial(*args, **kwargs)
            root = bound.arguments.get("index_path")
        except TypeError:
            root = None
        spark = SparkSession.getActiveSession()
        if root is None or spark is None:
            return fn(*args, **kwargs)
        with pinned_manifest(spark, root):
            return fn(*args, **kwargs)

    return wrapper


def staged_rel_dir(rel: str) -> str:
    """A fresh versioned directory NAME for staging a relation
    rewrite (pass to ``publish`` after the write completes)."""
    return f"{rel}.v{uuid.uuid4().hex[:12]}.parquet"


def publish(spark, root: str, updates: dict[str, str]) -> None:
    """Atomically point the named relations at their staged
    directories: merge ``updates`` (rel → staged dirname) over the
    current mapping and write ONE new manifest file via
    create-temp + rename-to-new-name (atomic; a reader lists either
    the old generation or the new one, never a partial file). Then
    garbage-collect versioned dirs unreferenced by the latest two
    generations and manifests beyond a bounded history."""
    fs, mdir = _fs(spark, f"{root}/{_MANIFEST_DIR}")
    if not fs.exists(mdir):
        fs.mkdirs(mdir)
    names = _list_manifests(spark, root)
    current = (
        _read_manifest_file(spark, root, names[-1]) if names else {}
    )
    seq = int(current.get("seq", 0)) + 1
    rels = dict(current.get("rels", {}))
    rels.update(updates)
    doc = json.dumps({"seq": seq, "rels": rels}, sort_keys=True)
    tmp = _jpath(spark, f"{root}/{_MANIFEST_DIR}/.tmp-{uuid.uuid4().hex}")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(doc.encode("utf-8")))
    finally:
        out.close()
    final = _jpath(spark, f"{root}/{_MANIFEST_DIR}/m{seq:012d}.json")
    if not fs.rename(tmp, final):
        fs.delete(tmp, False)
        raise IOError(
            f"manifest publish collision at {root} seq {seq} "
            "(concurrent maintainer? the maintenance tier is "
            "single-writer by contract)"
        )
    _gc(spark, root, rels)


def _gc(spark, root: str, latest_rels: dict[str, str]) -> None:
    """Delete versioned relation dirs no manifest in the grace window
    (latest two generations) references, then trim manifest history.
    Best-effort: a GC failure never fails the publish.

    Known gap (documented, r16 ADVICE): only dirs referenced by a
    RETIRED manifest are swept. A staged ``.v*`` dir whose write
    completed but whose publish crashed is referenced by NO manifest
    and is never garbage-collected — each crashed maintenance attempt
    leaks one relation copy until an operator removes it manually
    (any ``.v*.parquet`` dir absent from every manifest in
    ``_manifests/`` is safe to delete once no maintenance job is
    running). Sweeping unreferenced dirs automatically would race an
    in-flight stage-then-publish, so it stays manual."""
    try:
        names = _list_manifests(spark, root)
        keep_dirs = set(latest_rels.values())
        if len(names) >= 2:
            prev = _read_manifest_file(spark, root, names[-2])
            keep_dirs |= set(prev.get("rels", {}).values())
        referenced_ever: set[str] = set()
        for nm in names[:-2]:
            referenced_ever |= set(
                _read_manifest_file(spark, root, nm)
                .get("rels", {})
                .values()
            )
        fs, rootp = _fs(spark, root)
        for st in fs.listStatus(rootp):
            nm = st.getPath().getName()
            # only dirs this layer created (rel.v<token>.parquet) are
            # GC candidates — legacy <rel>.parquet dirs are handled
            # below, and only retired-manifest-owned dirs ever go
            if (
                ".v" in nm
                and nm.endswith(".parquet")
                and nm not in keep_dirs
                and nm in referenced_ever
            ):
                fs.delete(st.getPath(), True)
        # the LEGACY dir of a relation mapped away for >= 2
        # generations is unreachable by any reader in the grace
        # window (pre-manifest readers resolve legacy only until the
        # first publish) — without this it leaks a full pre-mutation
        # copy forever, and a drop+recreate would resurrect it
        if len(names) >= 2:
            prev_rels = set(
                _read_manifest_file(spark, root, names[-2])
                .get("rels", {})
            )
            for rel in latest_rels:
                if rel in prev_rels:
                    lp = _jpath(spark, f"{root}/{rel}.parquet")
                    if fs.exists(lp):
                        fs.delete(lp, True)
        for nm in names[:-_KEEP_MANIFESTS]:
            fs.delete(_jpath(spark, f"{root}/{_MANIFEST_DIR}/{nm}"), False)
    except Exception:  # noqa: BLE001 — GC is advisory
        pass
