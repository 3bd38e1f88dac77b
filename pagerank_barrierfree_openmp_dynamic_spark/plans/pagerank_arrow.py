"""Arrow-vectorized dense-vector PageRank kernel (the fast path).

The north-star physical design: edges live as hash-partitioned, CSR-shaped
per-partition blocks; each superstep broadcasts the rank vector, every
partition gather-scatters its edge block with NumPy (``np.bincount`` —
the vectorized equivalent of the reference's per-vertex gather,
``/root/reference/src/pagerank.hxx:203-213``), and emits ONE dense partial
accumulator as a binary cell; the driver tree-sums the partials and applies
the rank update + convergence/frontier logic in NumPy.

Why this matches Spark's execution model at scale: the per-superstep work
is a single narrow stage over persisted partitions (no shuffle at all —
the ``groupBy(dst)`` shuffle of the join-agg path is replaced by the
partial-vector reduction), and the broadcast is O(N) doubles. The mode is
applicable while the rank vector fits in executor memory — N ≈ 1e8-1e9
vertices (0.8-8 GB), which covers every web graph the reference runs
(up to webbase-2001's 118M vertices). Beyond that, ``plans.pagerank``
(join-agg, fully sharded state) is the path; both produce identical ranks
(same recurrence, same stop rule) and share ``PageRankOptions`` /
``PageRankResult`` / checkpoint format.

Per-partition CSR blocks are cached in the (reused) Python worker
processes keyed by (graph epoch, partition id) — built once from the Arrow
batches on first touch, reused across supersteps; the reference's
"build CSR once, iterate many" (``src/csr.hxx:19-51``).
"""

from __future__ import annotations

import os
import time
import uuid
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from ..checkpoint import CheckpointStore
from ..operators.graph import LinkGraph
from ..session import adaptive_execution
from .pagerank import PageRankOptions, PageRankResult

# worker-process cache: (epoch, kind, ...) -> per-slice edge arrays.
# Per-key LRU: a hit refreshes the key, inserts evict the LEAST-recently-used
# entry only. A worker that accumulates res+gs+rev+lpa keys across many
# slices (slice->task assignment is not sticky) evicts cold foreign-epoch
# entries one at a time instead of dumping the whole cache and redoing the
# per-slice argsort/divide work every superstep.
from collections import OrderedDict  # noqa: E402

_BLOCK_CACHE: OrderedDict = OrderedDict()
_BLOCK_CACHE_MAX = 192
# Byte budget per WORKER PROCESS in addition to the entry cap: derived
# per-slice arrays (the gs/own/upd sorted forms) are ~30 bytes/edge, so at
# 100M-edge scale a single entry is ~100 MB and 192 of them would be ~20 GB
# *per worker* — the box OOMs long before the entry cap bites (observed:
# the JVM got OOM-killed mid-experiment). mmap-backed views cost pages the
# OS can reclaim, so they are counted as free. Override with
# SPARK_GRAFT_WORKER_CACHE_BYTES to match executor memory on a cluster.
_BLOCK_CACHE_BYTES = int(os.environ.get(
    "SPARK_GRAFT_WORKER_CACHE_BYTES", str(1536 * 1024 * 1024)))
_BLOCK_CACHE_USED = 0


def _entry_nbytes(blk) -> int:
    if isinstance(blk, np.memmap):
        return 0  # page-cache backed; reclaimable, shared across workers
    if isinstance(blk, np.ndarray):
        return int(blk.nbytes)
    if isinstance(blk, (tuple, list)):
        return sum(_entry_nbytes(b) for b in blk)
    return 0


def _cache_get(key):
    blk = _BLOCK_CACHE.get(key)
    if blk is not None:
        _BLOCK_CACHE.move_to_end(key)
        return blk[1]
    return None


def _cache_put(key, blk):
    global _BLOCK_CACHE_USED
    nb = _entry_nbytes(blk)
    old = _BLOCK_CACHE.pop(key, None)
    if old is not None:
        _BLOCK_CACHE_USED -= old[0]
    _BLOCK_CACHE[key] = (nb, blk)
    _BLOCK_CACHE_USED += nb
    while _BLOCK_CACHE and (
            len(_BLOCK_CACHE) > _BLOCK_CACHE_MAX
            or (_BLOCK_CACHE_USED > _BLOCK_CACHE_BYTES
                and len(_BLOCK_CACHE) > 1)):
        _k, (onb, _b) = _BLOCK_CACHE.popitem(last=False)
        _BLOCK_CACHE_USED -= onb


def fault_draw(seed: int, it: int, s: int) -> float:
    """Deterministic uniform [0,1) draw for fault injection, keyed on
    (seed, superstep, slice) — the Spark task analogue of the reference's
    per-thread RNG (``/root/reference/main.cxx:144-147``). Pure function
    of its arguments so the DRIVER can predict exactly which task
    attempts fault (scripts/fault_experiment.py reports the predicted
    count next to the measured overhead)."""
    import hashlib

    h = hashlib.blake2b(f"{seed}:{it}:{s}".encode(), digest_size=8).digest()
    return int.from_bytes(h, "big") / 2.0**64


def _inject_fault(fault, s: int) -> None:
    """Worker-side fault injection at slice start. ``fault`` is
    ``(crash_prob, sleep_prob, sleep_ms, seed, it)`` or None (hot path:
    one None check). Crashes fire on FIRST task attempts only — the
    retried attempt recomputes the pure kernel against the same immutable
    inputs, so recovery is bit-identical (reference crash tolerance,
    README.md:110-123, but exact instead of survivors-absorb-work)."""
    if fault is None:
        return
    crash_p, sleep_p, sleep_ms, seed, it = fault
    u = fault_draw(seed, it, s)
    if crash_p > 0.0 and u < crash_p:
        from pyspark import TaskContext

        tc = TaskContext.get()
        if tc is None or tc.attemptNumber() == 0:
            raise RuntimeError(
                f"injected task crash (slice {s}, superstep {it}) — "
                "fault_crash_prob experiment")
    if sleep_p > 0.0 and u < sleep_p and sleep_ms > 0:
        time.sleep(sleep_ms / 1000.0)


# --- driver-state budget for the dense path --------------------------------
# The dense kernel keeps O(N) DRIVER-resident state (documented design,
# BENCH/BASELINE.md §1): the sorted ids and out-degree vectors on the index
# (8 B each) plus rank / previous / partial-sum vectors and frontier masks
# in the kernel loop — ~6 8-byte-per-vertex arrays worst-case. Beyond the
# budget the fully-sharded join-agg plan (``plans.pagerank``) is the right
# physical strategy; both produce identical ranks, so the selection is a
# pure planning decision. Override with SPARK_GRAFT_DRIVER_STATE_BUDGET
# (bytes) to match the deployment's driver heap.
DRIVER_STATE_BYTES_PER_VERTEX = 48
DRIVER_STATE_BUDGET = int(os.environ.get(
    "SPARK_GRAFT_DRIVER_STATE_BUDGET", str(16 * 1024 ** 3)))


def dense_state_fits(num_vertices: int, budget: int | None = None) -> bool:
    """True when the dense path's O(N) driver state fits ``budget`` bytes
    (default: module ``DRIVER_STATE_BUDGET``). The planning predicate
    behind :func:`pagerank_auto` and the :class:`DenseGraph` guard."""
    b = DRIVER_STATE_BUDGET if budget is None else budget
    return num_vertices * DRIVER_STATE_BYTES_PER_VERTEX <= b


def _check_dense_budget(num_vertices: int) -> None:
    if not dense_state_fits(num_vertices):
        raise ValueError(
            f"dense path refused: {num_vertices} vertices need "
            f"~{num_vertices * DRIVER_STATE_BYTES_PER_VERTEX >> 20} MiB of "
            "driver-resident state, over the "
            f"{DRIVER_STATE_BUDGET >> 20} MiB budget "
            "(SPARK_GRAFT_DRIVER_STATE_BUDGET). Use the fully-sharded "
            "join-agg plan (plans.pagerank.pagerank / pagerank_auto) — "
            "identical ranks, no O(N) driver state")


class DenseGraph:
    """Dense-indexed view of a LinkGraph, ready for the Arrow kernel.

    - ``idx_of``: DataFrame (id, idx) — dense ids [0, N) assigned by sorted
      vertex id via zipWithIndex (distributed; no single-partition window).
    - ``blocks``: (src_idx, dst_idx, w) int32/int32/float64, hash-partitioned
      by src_idx, persisted — the CSR-shaped edge blocks.
    - ``ids``: np.ndarray mapping idx -> original id (driver-side, O(N)).
    - ``materialize()``: additionally writes the blocks as slice-partitioned
      parquet so supersteps can run *resident*: each task reads its slice
      once (pyarrow, OS-page-cached), keeps the NumPy arrays in the reused
      worker process, and later supersteps ship NO edge bytes through the
      JVM<->Python Arrow channel at all. On a cluster the same layout lives
      on HDFS/object storage with executor-local caching — the distributed
      analogue of the reference's shared-memory CSR residency.
    """

    # broadcast the id->idx map into the remap joins below this vertex count
    BROADCAST_MAP_MAX = 5_000_000

    def __init__(self, graph: LinkGraph):
        from ..operators.graph import dense_ids

        _check_dense_budget(graph.num_vertices)
        self.graph = graph
        self.epoch = uuid.uuid4().hex
        n = graph.num_vertices
        self.idx_of = (
            dense_ids(graph.vertices, "id", graph.partitions)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        src_m = self.idx_of.select(F.col("id").alias("src"), F.col("idx").alias("src_idx"))
        dst_m = self.idx_of.select(F.col("id").alias("dst"), F.col("idx").alias("dst_idx"))
        if n <= self.BROADCAST_MAP_MAX:
            src_m, dst_m = F.broadcast(src_m), F.broadcast(dst_m)
        # Unweighted blocks carry (src_idx, dst_idx) ONLY — no per-edge
        # weight. The superstep broadcasts q = r / outdeg instead of r, so
        # the weight is folded into the broadcast vector. This halves block
        # bytes AND makes edge-batch deltas O(batch): an insert/delete never
        # has to touch its source's sibling edges when the out-degree
        # changes (the degree lives in the driver-side ``deg`` vector).
        # Weighted graphs carry the pre-normalized transition weight
        # w = weight/Σ(out-weights) from ``graph.adj`` and broadcast q = r.
        self.weighted = graph.weighted
        base = graph.adj if self.weighted else graph.edges
        self.blocks = (
            base.join(src_m, "src")
            .join(dst_m, "dst")
            .select(
                F.col("src_idx").cast("int").alias("src_idx"),
                F.col("dst_idx").cast("int").alias("dst_idx"),
                *([F.col("w").cast("double").alias("w")] if self.weighted else []),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        self.blocks.count()
        # dense_ids assigns idx in sorted-id order, so placing by idx yields
        # a sorted ids array (``_to_idx`` relies on this) — no Spark sort.
        ids_pdf = self.idx_of.toPandas()
        self.ids = np.empty(n, dtype=np.int64)
        self.ids[ids_pdf["idx"].to_numpy()] = ids_pdf["id"].to_numpy()
        self.n = n
        deg_pdf = self.blocks.groupBy("src_idx").count().toPandas()
        self.deg = np.zeros(n, dtype=np.float64)
        self.deg[deg_pdf["src_idx"].to_numpy()] = deg_pdf["count"].to_numpy()
        self.resident_dir: str | None = None
        # slice count scales with edge volume: below ~100k edges/slice the
        # per-task fixed cost (launch + Arrow round-trip) dominates the
        # bincount, so small graphs use fewer, fatter slices (measured 27%
        # faster supersteps at 700k edges with 8 slices vs 32); large
        # graphs keep the full partition width for compute parallelism
        self.n_slices = int(
            min(graph.partitions, max(4, graph.num_edges // 100_000)))
        # delta-overlay chain: one UNIQUE tag per applied batch. The tag —
        # not a sequential generation number — names the overlay files and
        # keys the worker block cache, so two sibling views derived from
        # the same base (e.g. different experiment batches over one graph)
        # can never read each other's deltas from disk or from a worker's
        # cache (the bug a sequential gen number had: both siblings were
        # "gen 1" with identical file names and cache keys).
        self.overlays: tuple[str, ...] = ()
        self._owns_files = True

    @property
    def gen(self) -> int:
        """Number of stacked delta-overlay generations (0 = base slices)."""
        return len(self.overlays)

    def _write_slices(self, key_col: str, prefix: str, with_w: bool) -> None:
        """Distributively write per-residue ``.npy`` slice files from
        ``blocks``: group by ``key_col % P``, one file set per slice. After
        the job, fill in EMPTY files for residues with no edges so a
        missing file always means loss/corruption (detected by a hard
        load error), never 'no edges'."""
        import os

        P = self.n_slices
        d = self.resident_dir

        def write_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from collections import defaultdict

            bufs: dict[int, list[pd.DataFrame]] = defaultdict(list)
            for pdf in batches:
                for s, grp in pdf.groupby(pdf[key_col] % P):
                    bufs[int(s)].append(grp)
            written = []
            for s, parts in bufs.items():
                grp = pd.concat(parts, ignore_index=True)
                np.save(f"{d}/{prefix}{s}_src.npy",
                        grp["src_idx"].to_numpy(np.int32))
                np.save(f"{d}/{prefix}{s}_dst.npy",
                        grp["dst_idx"].to_numpy(np.int32))
                if with_w and "w" in grp.columns:
                    np.save(f"{d}/{prefix}{s}_w.npy",
                            grp["w"].to_numpy(np.float64))
                written.append(s)
            yield pd.DataFrame({"slice": written})

        (
            self.blocks.withColumn("slice", F.pmod(F.col(key_col), F.lit(P)))
            .repartition(P, "slice")
            .drop("slice")
            .mapInPandas(write_fn, "slice int")
            .count()
        )
        empty = np.empty(0, np.int32)
        for s in range(P):
            if not os.path.exists(f"{d}/{prefix}{s}_src.npy"):
                np.save(f"{d}/{prefix}{s}_src.npy", empty)
                np.save(f"{d}/{prefix}{s}_dst.npy", empty)
                if with_w and self.weighted:
                    # weighted readers (materialize_masked, _load_slice)
                    # load the _w file unconditionally for non-empty
                    # views; an empty residue needs its empty _w too, or
                    # the missing-file-means-corruption rule misfires
                    np.save(f"{d}/{prefix}{s}_w.npy",
                            np.empty(0, np.float64))

    def materialize(self, path: str | None = None) -> "DenseGraph":
        """Write per-slice ``.npy`` edge blocks for resident supersteps.

        Slice by dst (mod P): each slice OWNS a disjoint residue class of
        destination indices, so superstep partials are disjoint compact
        segments (total collect volume = N doubles, not P*N) and hub
        in-degree skew spreads uniformly across slices.

        Workers ``np.load(mmap_mode='r')`` their slice — the OS page cache
        keeps ONE physical copy shared by every worker process, and loads
        are zero-copy. Files are written distributively (each slice's rows
        live in exactly one partition after the hash repartition). On a
        multi-node cluster, point ``path`` at shared/node-local storage;
        the persisted ``blocks`` DataFrame remains the durable source.
        """
        import os
        import tempfile

        if self.resident_dir:
            return self
        if path:
            os.makedirs(path, exist_ok=True)
            d = path
        else:
            d = tempfile.mkdtemp(prefix=f"linkgraph_blocks_{self.epoch[:8]}_")
        self.resident_dir = d
        self._write_slices("dst_idx", "slice_", with_w=True)
        return self

    def materialize_reverse(self) -> "DenseGraph":
        """Write src-residue-sliced reverse blocks (the CSC complement of
        the dst-residue CSR slices): kernels that propagate along BOTH edge
        directions (connected components) read slice ``s``'s base file for
        the in-edges and its ``rslice`` file for the out-edges of the same
        vertex residue class — one narrow job per superstep, compact
        segments, no shuffle. Built once per graph, idempotent."""
        import os

        if self.resident_dir is None:
            self.materialize()
        marker = f"{self.resident_dir}/_rev_done"
        if os.path.exists(marker):
            return self
        if self.blocks is None:
            raise ValueError(
                "reverse blocks need the blocks DataFrame — a DenseGraph "
                "restored with load() has forward slices only; rebuild via "
                "DenseGraph(graph)")
        self._write_slices("src_idx", "rslice_", with_w=False)
        open(marker, "w").close()
        return self

    def materialize_masked(self) -> "DenseGraph":
        """Write per-slice DST-SORTED auxiliary files for the frontier-
        masked scatter: ``msort_{s}_{src,own}.npy`` (+``_w`` when
        weighted) with an ``indptr`` over the owned residue positions,
        plus a SRC-SORTED live-edge view ``esort_{s}_{src,dst}.npy`` for
        mover expansion. The masked kernel mmaps these — a sparse
        superstep reads O(active in-edges) PAGES, worker processes hold
        NO derived per-slice arrays in RAM (the in-memory CSR variant
        thrashed the worker block cache at 100M-edge scale: ~100 MB per
        slice × slices × generations), and the OS page cache keeps one
        physical copy shared by every worker. Stable dst-sort preserves
        each destination's in-edge file order, so masked sums are
        FP-identical to the unsorted scatter. Built once per graph,
        idempotent; delta overlays stay small and are sorted per task at
        superstep time."""
        import os

        if self.resident_dir is None:
            self.materialize()
        marker = f"{self.resident_dir}/_msort_done"
        if os.path.exists(marker):
            return self
        d = self.resident_dir
        P = self.n_slices
        n = self.n
        weighted = self.weighted
        spark = self.graph.edges.sparkSession

        def build_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            done = []
            for pdf in batches:
                for s in pdf["id"].to_numpy():
                    s = int(s)
                    src = np.load(f"{d}/slice_{s}_src.npy", mmap_mode="r")
                    dst = np.load(f"{d}/slice_{s}_dst.npy", mmap_mode="r")
                    src = np.asarray(src)
                    dst = np.asarray(dst)
                    own = (dst // P).astype(np.int64)
                    order = np.argsort(own, kind="stable")
                    own_s = own[order]
                    seg_len = len(range(s, n, P))
                    np.save(f"{d}/msort_{s}_src.npy",
                            src[order].astype(np.int32))
                    np.save(f"{d}/msort_{s}_own.npy",
                            own_s.astype(np.int32))
                    np.save(f"{d}/msort_{s}_ptr.npy", np.searchsorted(
                        own_s, np.arange(seg_len + 1)).astype(np.int64))
                    if weighted:
                        w = np.asarray(np.load(f"{d}/slice_{s}_w.npy",
                                               mmap_mode="r"))
                        np.save(f"{d}/msort_{s}_w.npy",
                                w[order].astype(np.float64))
                    so = np.argsort(src, kind="stable")
                    np.save(f"{d}/esort_{s}_src.npy",
                            src[so].astype(np.int32))
                    np.save(f"{d}/esort_{s}_dst.npy",
                            dst[so].astype(np.int32))
                    done.append(s)
            yield pd.DataFrame({"slice": done})

        (spark.range(0, P, 1, P)
         .mapInPandas(build_fn, "slice int").count())
        open(marker, "w").close()
        return self

    def save(self, path: str | None = None) -> str:
        """Persist the complete dense index — slice blocks + ids/deg vectors
        + meta — so later sessions (or other jobs) restore it with
        :meth:`load` and skip the dictionary joins, degree scan, and slice
        write entirely. Returns the index directory."""
        import json
        import os
        import re
        import shutil

        if (path and self.resident_dir
                and os.path.abspath(path) != os.path.abspath(self.resident_dir)):
            # already materialized elsewhere (e.g. a tempdir): snapshot the
            # slice files into the requested directory — materialize(path)
            # would no-op and silently write the index into the OLD dir,
            # which vanishes with the tempdir
            os.makedirs(path, exist_ok=True)
            # copy only the files load()/the kernels actually read: base +
            # reverse slices, delta overlays up to THIS view's generation,
            # and the reverse-done marker — never in-flight async rank
            # buffers or later generations from sibling views
            keep = re.compile(
                r"^(slice_\d+_(src|dst|w)\.npy"
                r"|rslice_\d+_(src|dst)\.npy"
                r"|_rev_done"
                r"|delta_([0-9a-f]+)_slice_\d+_(ins|del)_(src|dst|w)\.npy)$")
            for name in os.listdir(self.resident_dir):
                m = keep.match(name)
                if not m:
                    continue
                if m.group(4) is not None and m.group(4) not in self.overlays:
                    continue  # sibling views' overlays are not this index
                shutil.copy2(os.path.join(self.resident_dir, name),
                             os.path.join(path, name))
            d = path
        else:
            self.materialize(path)
            d = self.resident_dir
        np.save(f"{d}/ids.npy", self.ids)
        np.save(f"{d}/deg.npy", self.deg)
        with open(f"{d}/meta.json", "w") as f:
            json.dump({"epoch": self.epoch, "n": self.n,
                       "m": self.graph.num_edges,
                       "n_slices": self.n_slices, "gen": self.gen,
                       "overlays": list(self.overlays),
                       "weighted": self.weighted}, f)
        return d

    @classmethod
    def load(cls, graph: LinkGraph, path: str) -> "DenseGraph":
        """Restore a saved dense index for resident supersteps. ``graph``
        supplies the session and the (logical) edge/vertex tables; the
        kernel itself reads only the slice files. The loaded view does not
        own the files (unpersist is a no-op) and has no ``blocks``
        DataFrame — streaming (non-resident) mode needs a fresh build.

        The index is validated against ``graph`` (vertex count, edge count,
        weightedness): the kernel reads only the slice files, so a stale
        index for a *different* graph would otherwise silently produce
        ranks for the old edges."""
        import json

        with open(f"{path}/meta.json") as f:
            meta = json.load(f)
        _check_dense_budget(graph.num_vertices)
        if int(meta["n"]) != graph.num_vertices:
            raise ValueError(
                f"dense index at {path} was built for n={meta['n']} vertices, "
                f"graph has {graph.num_vertices} — rebuild the index")
        if "m" in meta and int(meta["m"]) != graph.num_edges:
            raise ValueError(
                f"dense index at {path} was built for m={meta['m']} edges, "
                f"graph has {graph.num_edges} — rebuild the index")
        if bool(meta.get("weighted", False)) != graph.weighted:
            raise ValueError(
                f"dense index at {path} weighted={meta.get('weighted', False)} "
                f"does not match graph.weighted={graph.weighted}")
        self = cls.__new__(cls)
        self.graph = graph
        self.epoch = meta["epoch"]
        self.n = int(meta["n"])
        self.n_slices = int(meta["n_slices"])
        self.overlays = tuple(meta.get("overlays", ()))
        if int(meta.get("gen", 0)) != len(self.overlays):
            raise ValueError(
                f"dense index at {path} was saved with an incompatible "
                "overlay format — rebuild the index")
        self.weighted = bool(meta.get("weighted", False))
        self.ids = np.load(f"{path}/ids.npy")
        self.deg = np.load(f"{path}/deg.npy")
        self.resident_dir = path
        self.idx_of = None
        self.blocks = None
        self._owns_files = False
        return self

    def dead_mask(self) -> np.ndarray:
        return self.deg == 0

    def inv_deg(self) -> np.ndarray:
        return np.where(self.deg > 0, 1.0 / np.maximum(self.deg, 1.0), 0.0)

    def apply_delta(self, net_ins: np.ndarray, net_del: np.ndarray,
                    ins_w: np.ndarray | None = None,
                    del_w: np.ndarray | None = None) -> "DenseGraph":
        """O(batch) incremental update: returns a NEW view sharing the base
        slice files plus one more delta-overlay generation.

        ``net_ins`` / ``net_del`` are (k, 2) int arrays of dense
        (src_idx, dst_idx) pairs that are net-added / net-removed relative
        to this view's edge set (caller computes net effect — see
        ``operators.batch.apply_batch_dense``). The reference's staged
        add/remove + ``updateOmpU`` commit (``src/update.hxx:70-99``), at
        batch cost instead of rebuild cost.
        """
        import copy

        if self.weighted:
            # a weighted insert/delete changes Σ(out-weights), re-scaling
            # every sibling edge's transition weight — so weighted overlays
            # are FULL REPLACEMENTS per touched source (del = all its old
            # edges at old normalized w, ins = its new edge set at the new
            # normalization; operators.batch._apply_batch_dense_weighted
            # builds them) and must carry per-edge weights
            if ins_w is None or del_w is None:
                raise ValueError(
                    "weighted delta overlays need per-edge normalized "
                    "weights (ins_w / del_w) — use apply_batch_dense")
            if len(ins_w) != len(net_ins) or len(del_w) != len(net_del):
                raise ValueError("ins_w/del_w must align with the pair rows")
        elif ins_w is not None or del_w is not None:
            raise ValueError("unweighted graphs take no delta weights")
        if self.resident_dir is None:
            self.materialize()
        ov = uuid.uuid4().hex[:12]  # unique overlay tag (never a sequence
        # number: sibling views built from the same base must not share
        # file names or worker-cache keys)
        P = self.n_slices
        for arr, wts, sign in ((net_ins, ins_w, 1), (net_del, del_w, -1)):
            if arr.size == 0:
                continue
            sl = arr[:, 1] % P
            for s in np.unique(sl):
                m = sl == s
                tag = "ins" if sign > 0 else "del"
                np.save(
                    f"{self.resident_dir}/delta_{ov}_slice_{int(s)}_{tag}_src.npy",
                    arr[m, 0].astype(np.int32))
                np.save(
                    f"{self.resident_dir}/delta_{ov}_slice_{int(s)}_{tag}_dst.npy",
                    arr[m, 1].astype(np.int32))
                if self.weighted:
                    np.save(
                        f"{self.resident_dir}/delta_{ov}_slice_{int(s)}_{tag}_w.npy",
                        np.asarray(wts)[m].astype(np.float64))
        new = copy.copy(self)
        new.overlays = self.overlays + (ov,)
        new.deg = self.deg.copy()
        if net_ins.size:
            np.add.at(new.deg, net_ins[:, 0], 1.0)
        if net_del.size:
            np.add.at(new.deg, net_del[:, 0], -1.0)
        new._owns_files = False
        return new

    def apply_delta_df(self, rows: "DataFrame",
                       deg_delta: tuple) -> "DenseGraph":
        """Distributed delta-overlay write: like :meth:`apply_delta`, but the
        overlay edges arrive as a DataFrame ``(tag 'ins'|'del', src_idx int,
        dst_idx int, w double)`` and the per-slice delta files are written by
        the WORKERS (same layout/ownership argument as ``_write_slices`` —
        after the hash repartition each dst-residue slice lives in exactly
        one partition, so each ``delta_*`` file has a single writer).

        This is the scale path for weighted full-replacement overlays, whose
        edge volume is O(Σ degree(touched sources)) — a batch touching a
        web-scale hub must not land the hub's adjacency on the driver
        (``operators.batch._apply_batch_dense_weighted`` builds ``rows``).
        The driver sees only the written (slice, tag) manifest and
        ``deg_delta`` = (idx, delta) arrays of O(touched sources).
        """
        import copy

        if self.resident_dir is None:
            self.materialize()
        ov = uuid.uuid4().hex[:12]  # unique overlay tag (see apply_delta)
        P = self.n_slices
        d = self.resident_dir
        weighted = self.weighted

        def write_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from collections import defaultdict

            bufs: dict[tuple, list[pd.DataFrame]] = defaultdict(list)
            for pdf in batches:
                for key, grp in pdf.groupby(["slice", "tag"]):
                    bufs[(int(key[0]), str(key[1]))].append(grp)
            out_s, out_t, out_n = [], [], []
            for (s, tag), parts in bufs.items():
                grp = pd.concat(parts, ignore_index=True)
                np.save(f"{d}/delta_{ov}_slice_{s}_{tag}_src.npy",
                        grp["src_idx"].to_numpy(np.int32))
                np.save(f"{d}/delta_{ov}_slice_{s}_{tag}_dst.npy",
                        grp["dst_idx"].to_numpy(np.int32))
                if weighted:
                    np.save(f"{d}/delta_{ov}_slice_{s}_{tag}_w.npy",
                            grp["w"].to_numpy(np.float64))
                out_s.append(s)
                out_t.append(tag)
                out_n.append(len(grp))
            yield pd.DataFrame({"slice": out_s, "tag": out_t, "rows": out_n})

        (
            rows.withColumn("slice", F.pmod(F.col("dst_idx"), F.lit(P)))
            .repartition(P, "slice")
            .mapInPandas(write_fn, "slice int, tag string, rows long")
            .count()
        )
        new = copy.copy(self)
        new.overlays = self.overlays + (ov,)
        new.deg = self.deg.copy()
        idxs, dv = deg_delta
        if len(idxs):
            np.add.at(new.deg, np.asarray(idxs, dtype=np.int64),
                      np.asarray(dv, dtype=np.float64))
        new._owns_files = False
        return new

    def unpersist(self) -> None:
        if not self._owns_files:
            return
        self.idx_of.unpersist()
        self.blocks.unpersist()
        if self.resident_dir:
            import shutil

            shutil.rmtree(self.resident_dir, ignore_errors=True)
            self.resident_dir = None


def _scatter_fn(epoch: str, n: int, q_bc, mask_bc):
    """Streaming-mode mapInPandas closure for one superstep. ``q_bc`` is the
    broadcast q vector (r/outdeg unweighted; r weighted, the per-edge
    transition weight then rides in the block); emits one dense float64
    partial accumulator per partition."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        key = (epoch, pid)
        block = _cache_get(key)
        if block is None:
            srcs, dsts, ws = [], [], []
            for pdf in batches:
                srcs.append(pdf["src_idx"].to_numpy(np.int32))
                dsts.append(pdf["dst_idx"].to_numpy(np.int32))
                if "w" in pdf.columns:
                    ws.append(pdf["w"].to_numpy(np.float64))
            if srcs:
                block = (np.concatenate(srcs), np.concatenate(dsts),
                         np.concatenate(ws) if ws else None)
            else:
                block = (np.empty(0, np.int32), np.empty(0, np.int32), None)
            _cache_put(key, block)
        else:
            for _ in batches:  # drain the Arrow stream
                pass
        src_idx, dst_idx, w = block
        q = q_bc.value
        if mask_bc is not None:
            keep = mask_bc.value[dst_idx]
            src_idx, dst_idx = src_idx[keep], dst_idx[keep]
            if w is not None:
                w = w[keep]
        contrib = q[src_idx] if w is None else q[src_idx] * w
        acc = np.bincount(dst_idx, weights=contrib, minlength=n)
        yield pd.DataFrame({"acc": [acc.astype(np.float64).tobytes()]})

    return fn


def _load_slice(resident_dir: str, epoch: str, s: int,
                overlays: tuple = (), weighted: bool = False):
    """Worker-side: load (and process-cache) one edge slice — the base
    (src, dst[, w]) mmap arrays plus the view's delta overlays (one unique
    tag per applied batch, in application order).
    Returns ``(base_src, base_dst, base_w_or_None,
    [(d_src, d_dst, d_w_or_None, sign), ...])``. On weighted graphs each
    delta carries per-edge normalized weights (written by ``apply_delta``
    from the full-replacement weighted overlay); their ``_w`` file missing
    while src/dst exist is corruption and raises.

    ``_write_slices`` backfills explicit EMPTY files for edge-less residues,
    so a missing/corrupt base file is data loss and RAISES (silently
    substituting an empty slice would drop that residue's in-edges and
    produce wrong ranks with no error). Only delta-overlay files may be
    legitimately absent (a generation that touched no edge in this slice).
    A weighted graph whose ``_w`` file is missing while src/dst are
    non-empty likewise hard-fails: scattering q with an implicit weight of
    1.0 is badly wrong since weighted mode does not fold 1/outdeg into q."""
    key = (epoch, "res", int(s), tuple(overlays), bool(weighted))
    block = _cache_get(key)
    if block is None:
        base = (
            np.load(f"{resident_dir}/slice_{int(s)}_src.npy", mmap_mode="r"),
            np.load(f"{resident_dir}/slice_{int(s)}_dst.npy", mmap_mode="r"),
        )
        if weighted:
            if len(base[0]):
                base_w = np.load(f"{resident_dir}/slice_{int(s)}_w.npy",
                                 mmap_mode="r")
            else:
                base_w = np.empty(0, np.float64)
        else:
            base_w = None
        deltas = []
        for ov in overlays:
            for tag, sign in (("ins", 1.0), ("del", -1.0)):
                sp = f"{resident_dir}/delta_{ov}_slice_{int(s)}_{tag}_src.npy"
                dp = f"{resident_dir}/delta_{ov}_slice_{int(s)}_{tag}_dst.npy"
                s_here, d_here = os.path.exists(sp), os.path.exists(dp)
                if not s_here and not d_here:
                    continue  # generation touched no edge in this slice
                if s_here != d_here:
                    # a half-written pair (crash/disk-full between the two
                    # np.save calls) is corruption: silently skipping it
                    # would compute ranks against a partially-applied batch
                    raise FileNotFoundError(
                        f"half-written delta overlay {ov}/{tag} for slice "
                        f"{int(s)}: {'src' if s_here else 'dst'} file "
                        "present without its pair")
                dsrc = np.load(sp)
                ddst = np.load(dp)
                # weighted deltas carry per-edge normalized weights; missing
                # them while src/dst exist would silently scatter weight-1.0
                dw = (np.load(
                    f"{resident_dir}/delta_{ov}_slice_{int(s)}_{tag}_w.npy")
                    if weighted else None)
                deltas.append((dsrc, ddst, dw, sign))
        block = (base[0], base[1], base_w, deltas)
        _cache_put(key, block)
    return block


def _load_scatter_slice(resident_dir: str, epoch: str, s: int, overlays: tuple,
                        n_slices: int, weighted: bool):
    """Worker-side: slice ``s``'s edge components with the owner index
    ``own = dst_idx // P`` precomputed once per (slice, generation) instead
    of re-divided every superstep — the bincount key array is graph-static.
    Returns ``[(src, dst, own, w_or_None, sign), ...]`` (base first, then
    delta overlays)."""
    key = (epoch, "own", int(s), tuple(overlays), bool(weighted))
    comps = _cache_get(key)
    if comps is None:
        bs, bd, bw, deltas = _load_slice(resident_dir, epoch, s, overlays,
                                         weighted)
        bd = np.asarray(bd)
        comps = [(bs, bd, (bd // n_slices).astype(np.int32), bw, 1.0)]
        for dsrc, ddst, dw, sign in deltas:
            comps.append((dsrc, ddst, (ddst // n_slices).astype(np.int32),
                          dw, float(sign)))
        _cache_put(key, comps)
    return comps


def _load_update_slice(resident_dir: str, epoch: str, s: int, overlays: tuple,
                       n_slices: int, weighted: bool, ivd: np.ndarray | None):
    """Worker-side: slice ``s``'s edges prepared for the FUSED update kernel:
    per-edge scatter factor ``f`` pre-gathered (transition weight ``w`` on
    weighted graphs, ``1/outdeg[src]`` otherwise — graph-static per
    generation, so gathered once instead of broadcasting q = r/outdeg and
    re-multiplying on the driver every superstep). Returns
    ``[(src, own, f, sign), ...]``."""
    key = (epoch, "upd", int(s), tuple(overlays), bool(weighted))
    comps = _cache_get(key)
    if comps is None:
        comps = []
        for src, _dst, own, w, sign in _load_scatter_slice(
                resident_dir, epoch, s, overlays, n_slices, weighted):
            src = np.asarray(src)
            f = np.asarray(w) if weighted else ivd[src]
            comps.append((src, own, f, float(sign)))
        _cache_put(key, comps)
    return comps


def _ragged_take(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenate the index ranges [starts[i], starts[i]+lens[i]) —
    the vectorized CSR row-gather (no Python loop over rows)."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, np.int64)
    ends = lens.cumsum()
    return np.repeat(starts - (ends - lens), lens) + np.arange(total)


def _load_msort(resident_dir: str, epoch: str, s: int, overlays: tuple,
                n_slices: int, weighted: bool,
                ivd: np.ndarray | None):
    """Worker-side: mmap views of slice ``s``'s dst-sorted base files
    (written by ``DenseGraph.materialize_masked``) plus the slice's delta
    overlays SORTED in-RAM (overlays are O(batch) — tiny). Returns
    ``(msrc, mown, indptr, mw_or_None, esrc, edst, delta_csr,
    delta_live)`` where ``delta_csr`` entries are
    ``(ds_sorted, own_sorted, f_sorted, sign)`` and ``delta_live`` the
    inserted edges' (src-sorted src, dst) for expansion.

    Only the mmap handles and the tiny delta arrays are cached — a
    worker's block cache stays O(batch) bytes per slice regardless of
    slice edge count (the page cache holds the single physical copy of
    the sorted files)."""
    key = (epoch, "msort", int(s), tuple(overlays), bool(weighted))
    block = _cache_get(key)
    if block is None:
        msrc = np.load(f"{resident_dir}/msort_{s}_src.npy", mmap_mode="r")
        mown = np.load(f"{resident_dir}/msort_{s}_own.npy", mmap_mode="r")
        indptr = np.load(f"{resident_dir}/msort_{s}_ptr.npy", mmap_mode="r")
        mw = (np.load(f"{resident_dir}/msort_{s}_w.npy", mmap_mode="r")
              if weighted else None)
        esrc = np.load(f"{resident_dir}/esort_{s}_src.npy", mmap_mode="r")
        edst = np.load(f"{resident_dir}/esort_{s}_dst.npy", mmap_mode="r")
        delta_csr, dl_src, dl_dst = [], [], []
        if overlays:
            _bs, _bd, _bw, deltas = _load_slice(
                resident_dir, epoch, s, overlays, weighted)
            P = n_slices
            for dsrc, ddst, dw, sign in deltas:
                dsrc = np.asarray(dsrc)
                ddst = np.asarray(ddst)
                own = (ddst // P).astype(np.int64)
                order = np.argsort(own, kind="stable")
                ds_s = dsrc[order]
                f_s = (np.asarray(dw)[order] if weighted else ivd[ds_s])
                delta_csr.append((ds_s, own[order], f_s, float(sign)))
                if sign > 0 and dsrc.size:
                    dl_src.append(dsrc)
                    dl_dst.append(ddst)
        if dl_src:
            lsrc = np.concatenate(dl_src)
            ldst = np.concatenate(dl_dst)
            so = np.argsort(lsrc, kind="stable")
            delta_live = (lsrc[so], ldst[so])
        else:
            delta_live = (np.empty(0, np.int32), np.empty(0, np.int32))
        block = (msrc, mown, indptr, mw, esrc, edst, delta_csr, delta_live)
        _cache_put(key, block)
    return block


def _resident_scatter_fn(resident_dir: str, epoch: str, n: int, n_slices: int,
                         overlays: tuple, state_bc,
                         weighted: bool = False, ivd_bc=None,
                         d: float = 0.85, c0: float | None = None,
                         D: float = 0.0, tol: float = 0.0,
                         contracting: bool = False,
                         fault=None):
    """Scatter over resident slices: the input DataFrame carries only slice
    ids — zero edge bytes cross the JVM<->Python boundary after warmup.
    Slice ``s`` owns destination indices ``s, s+P, s+2P, ...``.
    ``state_bc`` is the superstep's SINGLE broadcast, carrying
    ``(rank vector, scope mask or None, movers pair or None)`` — one
    driver round-trip per superstep instead of three. Per-edge scatter
    factors (transition weight, or 1/outdeg from the run-static
    ``ivd_bc``) are pre-gathered in the cached slice forms, and delta
    overlays contribute with their sign.

    Frontier mode (``mask_bc`` set) runs over the cached DST-CSR form
    (``_load_masked_slice``): the active owned positions select their
    in-edge ranges by indptr (one vectorized ragged gather), so the
    superstep's work — and its Arrow output, emitted SPARSE as
    (idx, val) pairs — is proportional to the affected set's in-edges,
    not to the slice's edge count. With a scalar teleport ``c0`` the rank
    update itself is FUSED into the task (the same fusion
    ``_resident_update_fn`` gives the full sweep): sparse rows carry NEW
    rank values, dense (flooded) rows a full new-rank segment with
    untouched positions copied from ``r``. ``c0=None`` (vector-teleport
    personalization) emits raw accumulators instead. Together these turn
    the reference's frontier pruning from an edge-work claim into a
    wall-clock win at 100M-edge scale (README.md:47-58).

    The movers pair ``(mask, sorted-index-array)`` fuses the previous
    superstep's frontier expansion into this scatter (halving the jobs
    per dynamic superstep): because a slice owns ALL in-edges of its dst
    residue class, each task expands the movers' out-neighbors locally
    via the src-sorted live-edge view, density-switched between
    O(|movers| log E + out-edges) binary search and one O(E) boolean
    gather, widens its own active set with them (their accumulators are
    then complete), and reports the expansion in the ``exp`` column for
    the driver to fold into the affected set."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        r, mask, movers = state_bc.value
        ivd = ivd_bc.value if ivd_bc is not None else None
        movers_idx = movers[1] if movers is not None else None
        P = n_slices
        for pdf in batches:
            for s in pdf["id"].to_numpy():
                s = int(s)
                _inject_fault(fault, s)
                seg_len = len(range(s, n, P))
                if mask is None:
                    # full sweep (vector-teleport static/naive): bincount
                    # over the pre-gathered (src, own, f) comps
                    comps = _load_update_slice(
                        resident_dir, epoch, s, overlays, P, weighted, ivd)
                    seg = np.zeros(seg_len)
                    m_edges = 0
                    for src, own, f, sign in comps:
                        if src.size:
                            seg += sign * np.bincount(
                                own, weights=r[src] * f, minlength=seg_len)
                            m_edges += int(src.size)
                    yield pd.DataFrame({"slice": [s], "acc": [seg.tobytes()],
                                        "idx": [b""], "m": [m_edges],
                                        "exp": [b""], "mov": [b""],
                                        "keep": [b""], "nact": [0],
                                        "e1": [0.0], "e2": [0.0],
                                        "ei": [0.0]})
                    continue
                mask_seg = mask[s::P]
                if movers is None and not mask_seg.any():
                    # idle slice, nothing to expand: emit a no-op sparse
                    # row (empty idx AND empty acc — the driver skips
                    # both placement branches) instead of serializing a
                    # full unchanged rank segment through Arrow
                    yield pd.DataFrame({
                        "slice": [s], "acc": [b""], "idx": [b""],
                        "m": [0], "exp": [b""], "mov": [b""],
                        "keep": [b""], "nact": [0],
                        "e1": [0.0], "e2": [0.0], "ei": [0.0]})
                    continue
                msrc, mown, indptr, mw, esrc, edst, dcsr, dlive = _load_msort(
                    resident_dir, epoch, s, overlays, P, weighted, ivd)
                exp_idx = np.empty(0, np.int32)
                exp_own = None
                if movers is not None:
                    m_mask = movers[0]
                    hits = []
                    for es, ed in ((esrc, edst), dlive):
                        if not len(es):
                            continue
                        # density switch: few movers -> binary-search
                        # their out-edge ranges, touching O(M) pages of
                        # the mmap'd src-sorted view; many (the driver
                        # then ships no index array) -> one boolean
                        # gather over the live edges
                        if (movers_idx is not None
                                and movers_idx.size * 20 < len(es)):
                            lo = np.searchsorted(es, movers_idx, "left")
                            hi = np.searchsorted(es, movers_idx, "right")
                            pos = _ragged_take(lo, hi - lo)
                            if pos.size:
                                hits.append(np.asarray(ed)[pos])
                        else:
                            sel = m_mask[np.asarray(es)]
                            if sel.any():
                                hits.append(np.asarray(ed)[sel])
                    if hits:
                        # owned-position flags instead of a sort-unique:
                        # O(hits + segment), and only NEWLY-activated
                        # positions leave the task (the driver's fold is
                        # idempotent, so already-masked ones carry no
                        # information — keeps flooded-phase output tiny)
                        expb = np.zeros(seg_len, dtype=bool)
                        for h in hits:
                            expb[h // P] = True
                        exp_own = np.flatnonzero(expb)
                        exp_idx = ((exp_own[~mask_seg[exp_own]] * P + s)
                                   .astype(np.int32))
                act = np.flatnonzero(mask_seg).astype(np.int64)
                if exp_own is not None and exp_own.size:
                    act = np.union1d(act, exp_own)
                if not act.size:
                    # movers expanded nothing into this slice: same no-op
                    # sparse row as the pre-load early-out above
                    yield pd.DataFrame({
                        "slice": [s], "acc": [b""], "idx": [b""],
                        "m": [0], "exp": [b""], "mov": [b""],
                        "keep": [b""], "nact": [0],
                        "e1": [0.0], "e2": [0.0], "ei": [0.0]})
                    continue
                seg = np.zeros(seg_len)
                m_edges = 0
                dense_frontier = True
                if act.size:
                    # exact selected-edge count from the indptr (O(act)
                    # mmap reads) drives the second density switch: a
                    # SPARSE frontier gathers only its in-edge ranges and
                    # emits (idx, val) pairs; a DENSE (flooded) frontier
                    # reverts to the boolean-mask bincount over the
                    # dst-sorted arrays — same restriction, same per-dst
                    # summation order, identical FP results, cheaper
                    # constants
                    starts = indptr[act]
                    lens = indptr[act + 1] - starts
                    sel_edges = int(lens.sum())
                    total_edges = len(msrc)
                    if sel_edges * 4 < total_edges:
                        dense_frontier = False
                        pos = _ragged_take(starts, lens)
                        if pos.size:
                            src_sel = np.asarray(msrc[pos])
                            f = (np.asarray(mw[pos]) if weighted
                                 else ivd[src_sel])
                            seg += np.bincount(
                                np.asarray(mown[pos]),
                                weights=r[src_sel] * f, minlength=seg_len)
                            m_edges += int(pos.size)
                        for ds_s, own_s, f_s, sign in dcsr:
                            dlo = np.searchsorted(own_s, act)
                            dhi = np.searchsorted(own_s, act, "right")
                            dpos = _ragged_take(dlo, dhi - dlo)
                            if dpos.size:
                                seg += sign * np.bincount(
                                    own_s[dpos],
                                    weights=r[ds_s[dpos]] * f_s[dpos],
                                    minlength=seg_len)
                                m_edges += int(dpos.size)
                    elif total_edges >= 500_000:
                        # FLOODED frontier at scale: sum ALL in-edges with
                        # the same pre-gathered comps the full-sweep kernel
                        # uses (shared worker-cache entries — no extra
                        # memory), then zero the non-active accumulators.
                        # Active dsts get identical sums; a flooded DF
                        # superstep costs exactly a naive-dynamic superstep
                        # instead of paying masked-path constants on ~all
                        # edges (m_edges honestly reports the full count).
                        act_seg = np.zeros(seg_len, dtype=bool)
                        act_seg[act] = True
                        comps = _load_update_slice(
                            resident_dir, epoch, s, overlays, P, weighted,
                            ivd)
                        for src, own, f, sign in comps:
                            if src.size:
                                seg += sign * np.bincount(
                                    own, weights=r[src] * f,
                                    minlength=seg_len)
                                m_edges += int(src.size)
                        seg[~act_seg] = 0.0
                    else:
                        # small slice: masked compaction still prunes the
                        # counted work and the constants don't matter
                        act_seg = np.zeros(seg_len, dtype=bool)
                        act_seg[act] = True
                        mown_a = np.asarray(mown)
                        keep = act_seg[mown_a]
                        if keep.any():
                            dsk = np.asarray(msrc)[keep]
                            f = (np.asarray(mw)[keep] if weighted
                                 else ivd[dsk])
                            seg += np.bincount(
                                mown_a[keep], weights=r[dsk] * f,
                                minlength=seg_len)
                            m_edges += int(dsk.size)
                        for ds_s, own_s, f_s, sign in dcsr:
                            if own_s.size:
                                dk = act_seg[own_s]
                                if dk.any():
                                    seg += sign * np.bincount(
                                        own_s[dk],
                                        weights=r[ds_s[dk]] * f_s[dk],
                                        minlength=seg_len)
                                    m_edges += int(dk.sum())
                if c0 is None:
                    # vector-teleport personalization: raw accumulators,
                    # driver applies the (vector) rank update
                    if not dense_frontier:
                        yield pd.DataFrame({
                            "slice": [s], "acc": [seg[act].tobytes()],
                            "idx": [(act * P + s).tobytes()],
                            "m": [m_edges], "exp": [exp_idx.tobytes()],
                            "mov": [b""], "keep": [b""], "nact": [0],
                            "e1": [0.0], "e2": [0.0], "ei": [0.0]})
                    else:
                        yield pd.DataFrame({
                            "slice": [s], "acc": [seg.tobytes()],
                            "idx": [b""], "m": [m_edges],
                            "exp": [exp_idx.tobytes()],
                            "mov": [b""], "keep": [b""], "nact": [0],
                            "e1": [0.0], "e2": [0.0], "ei": [0.0]})
                    continue
                # FULLY fused: new ranks, per-slice norm partials, the
                # next superstep's movers, and (contracting) surviving
                # actives all computed here — the driver's per-superstep
                # serial work drops to segment placement + P-way combines
                gidx = act * P + s
                vals = c0 + d * seg[act]
                dl = np.abs(vals - r[gidx])
                e1 = float(dl.sum())
                e2 = float(dl @ dl)
                ei = float(dl.max()) if dl.size else 0.0
                mov = gidx[dl > D]
                keep = (gidx[dl > tol] if contracting
                        else np.empty(0, np.int64))
                if not dense_frontier:
                    yield pd.DataFrame({
                        "slice": [s], "acc": [vals.tobytes()],
                        "idx": [gidx.tobytes()],
                        "m": [m_edges], "exp": [exp_idx.tobytes()],
                        "mov": [mov.tobytes()], "keep": [keep.tobytes()],
                        "nact": [int(act.size)],
                        "e1": [e1], "e2": [e2], "ei": [ei]})
                    continue
                out_seg = np.array(r[s::P], dtype=np.float64)
                if act.size:
                    out_seg[act] = vals
                yield pd.DataFrame({
                    "slice": [s], "acc": [out_seg.tobytes()],
                    "idx": [b""], "m": [m_edges],
                    "exp": [exp_idx.tobytes()],
                    "mov": [mov.tobytes()], "keep": [keep.tobytes()],
                    "nact": [int(act.size)],
                    "e1": [e1], "e2": [e2], "ei": [ei]})

    return fn


def _resident_update_fn(resident_dir: str, epoch: str, n: int, n_slices: int,
                        overlays: tuple, weighted: bool, d: float, c0: float,
                        r_bc, ivd_bc, fault=None):
    """FUSED full-sweep superstep (static / naive-dynamic, uniform teleport):
    each slice scatters its in-edges AND applies the rank update + error
    reduction for its owned dst-residue segment, emitting the NEW rank
    segment plus partial L1/L2/L∞ norms. The driver's per-superstep work
    shrinks to segment placement + P-way scalar norm combine — the O(N)
    driver-side ``new_r = c0 + d*acc`` / ``|new - old|`` / norm passes (the
    measured serial term of the N-vs-4N scaling pairs) run inside the
    parallel stage instead. Per-edge scatter factors (w or 1/outdeg) are
    pre-gathered per slice (``_load_update_slice``), so the driver no longer
    computes q = r·ivd before each broadcast either. Same math, same FP
    order as the accumulator path: identical ranks."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        r = r_bc.value
        ivd = ivd_bc.value if ivd_bc is not None else None
        P = n_slices
        for pdf in batches:
            for s in pdf["id"].to_numpy():
                s = int(s)
                _inject_fault(fault, s)
                seg_len = len(range(s, n, P))
                comps = _load_update_slice(
                    resident_dir, epoch, s, overlays, P, weighted, ivd)
                acc = np.zeros(seg_len)
                m_edges = 0
                for src, own, f, sign in comps:
                    if src.size:
                        acc += sign * np.bincount(
                            own, weights=r[src] * f, minlength=seg_len)
                        m_edges += int(src.size)
                new = c0 + d * acc
                delta = np.abs(new - r[s::P])
                yield pd.DataFrame({
                    "slice": [s], "acc": [new.tobytes()], "m": [m_edges],
                    "e1": [float(delta.sum())],
                    "e2": [float(np.dot(delta, delta))],
                    "ei": [float(delta.max()) if delta.size else 0.0],
                })

    return fn


def _load_gs_slice(resident_dir: str, epoch: str, s: int, overlays: tuple,
                   n_slices: int, weighted: bool):
    """Worker-side: slice ``s``'s edges sorted by owner index (dst // P) for
    chunked Gauss-Seidel sweeps, with per-edge sign (delta overlays) and the
    owned-source overlay index precomputed. Cached per worker process like
    the base slices."""
    key = (epoch, "gs", int(s), tuple(overlays), bool(weighted))
    blk = _cache_get(key)
    if blk is None:
        bs, bd, bw, deltas = _load_slice(resident_dir, epoch, s, overlays,
                                         weighted)
        P = n_slices
        srcs = [np.asarray(bs, dtype=np.int64)]
        dsts = [np.asarray(bd, dtype=np.int64)]
        sgns = [np.ones(len(bs))]
        ws = [np.asarray(bw, dtype=np.float64)] if weighted else None
        for dsrc, ddst, dw, sign in deltas:
            srcs.append(np.asarray(dsrc, dtype=np.int64))
            dsts.append(np.asarray(ddst, dtype=np.int64))
            sgns.append(np.full(len(dsrc), float(sign)))
            if weighted:
                ws.append(np.asarray(dw, dtype=np.float64))
        src = np.concatenate(srcs)
        own = np.concatenate(dsts) // P
        sgn = np.concatenate(sgns)
        w = np.concatenate(ws) if ws else None
        order = np.argsort(own, kind="stable")
        src, own, sgn = src[order], own[order], sgn[order]
        if w is not None:
            w = w[order]
        own_src = src % P == s          # sources this slice itself owns
        src_loc = np.where(own_src, src // P, 0)
        blk = (src, own, sgn, w, own_src, src_loc)
        _cache_put(key, blk)
    return blk


def _gs_update_fn(resident_dir: str, epoch: str, n: int, n_slices: int,
                  overlays: tuple, weighted: bool, d: float, c0: float,
                  r_bc, ivd_bc, mask_bc, movers_bc, chunks: int,
                  shared_path: str | None, sweeps: int = 1, fault=None):
    """Asynchronous rank-update pass (reference ASYNC=true,
    ``src/pagerankBarrierfree.hxx:213-235``): each slice computes NEW ranks
    for its owned dst-residue segment in ``chunks`` ordered chunks; while
    processing chunk ``c`` it reads already-updated ranks for sources it
    owns from earlier chunks (Gauss-Seidel within the slice). With
    ``shared_path`` set (single-node barrier-free mode) the rank vector
    lives in one mmap'd buffer: every chunk update is written through to it
    and every gather reads the freshest mix of old/new ranks that any
    concurrently-running slice has published — the reference's OpenMP
    shared-memory execution model. Emits the new rank segment (not an
    accumulator); teleport/dead-end mass ``c0`` is the scalar the driver
    computed from the previous iteration's ranks, as in the reference's
    per-iteration ``pagerankBarrierfreeTeleportOmp``."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mask = mask_bc.value if mask_bc is not None else None
        # movers broadcast is a (mask, sorted-index) pair; this kernel
        # gathers by mask
        movers = movers_bc.value[0] if movers_bc is not None else None
        r_shared = (np.load(shared_path, mmap_mode="r+")
                    if shared_path else None)
        r_glob = r_shared if r_shared is not None else r_bc.value
        ivd = ivd_bc.value if ivd_bc is not None else None
        P = n_slices
        for pdf in batches:
            for s in pdf["id"].to_numpy():
                s = int(s)
                _inject_fault(fault, s)
                seg_len = len(range(s, n, P))
                src, own, sgn, w, own_src, src_loc = _load_gs_slice(
                    resident_dir, epoch, s, overlays, P, weighted)
                exp_idx = np.empty(0, np.int64)
                if movers is not None:
                    live = (sgn > 0) & movers[src]
                    if live.any():
                        exp_idx = np.unique(own[live] * P + s)
                upd_seg = None
                if mask is not None:
                    upd_seg = mask[s::P].copy()
                    if exp_idx.size:
                        upd_seg[exp_idx // P] = True
                r_own = np.array(r_glob[s::P], dtype=np.float64)
                L = max(1, -(-seg_len // max(1, chunks)))
                m_edges = 0
                for _sweep in range(max(1, sweeps)):
                    for lo in range(0, seg_len, L):
                        hi = min(seg_len, lo + L)
                        e0, e1 = np.searchsorted(own, [lo, hi])
                        es, eo, eg = src[e0:e1], own[e0:e1], sgn[e0:e1]
                        ew = w[e0:e1] if w is not None else None
                        eos, elc = own_src[e0:e1], src_loc[e0:e1]
                        if upd_seg is not None and eo.size:
                            keep = upd_seg[eo]
                            es, eo, eg = es[keep], eo[keep], eg[keep]
                            eos, elc = eos[keep], elc[keep]
                            if ew is not None:
                                ew = ew[keep]
                        if eo.size:
                            rv = np.asarray(r_glob[es], dtype=np.float64)
                            if r_shared is None:
                                # broadcast mode: overlay this slice's own
                                # already-updated sources (shared mode reads
                                # them — and every other slice's — for free)
                                rv[eos] = r_own[elc[eos]]
                            contrib = rv * (ew if weighted else ivd[es])
                            acc = np.bincount(eo - lo, weights=eg * contrib,
                                              minlength=hi - lo)
                            m_edges += int(eo.size)
                        else:
                            acc = np.zeros(hi - lo)
                        new = c0 + d * acc
                        tgt = r_own[lo:hi]
                        if upd_seg is None:
                            tgt[:] = new
                        else:
                            u = upd_seg[lo:hi]
                            tgt[u] = new[u]
                        if r_shared is not None:
                            r_shared[s::P][lo:hi] = tgt
                yield pd.DataFrame({"slice": [s], "acc": [r_own.tobytes()],
                                    "m": [m_edges],
                                    "exp": [exp_idx.astype(np.int32).tobytes()]})

    return fn


def _load_rslice(resident_dir: str, epoch: str, s: int):
    """Worker-side: load (and process-cache) slice ``s``'s reverse block —
    (src_idx, dst_idx) mmap arrays of the edges whose SOURCE is in residue
    class ``s``. ``materialize_reverse`` guarantees the files exist for
    every slice (empty residues get empty files), so a missing file is
    loss/corruption and raises instead of silently dropping out-edges."""
    key = (epoch, "rev", int(s))
    rev = _cache_get(key)
    if rev is None:
        rev = (
            np.load(f"{resident_dir}/rslice_{int(s)}_src.npy", mmap_mode="r"),
            np.load(f"{resident_dir}/rslice_{int(s)}_dst.npy", mmap_mode="r"),
        )
        _cache_put(key, rev)
    return rev


def _cc_min_fn(resident_dir: str, epoch: str, n_slices: int, lab_bc):
    """One min-label superstep for connected components: slice ``s`` takes
    the elementwise minimum of its vertices' labels and the labels of their
    in-neighbors (base dst-residue slice) and out-neighbors (reverse
    src-residue slice), emitting the compact segment."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lab = lab_bc.value
        P = n_slices
        for pdf in batches:
            for s in pdf["id"].to_numpy():
                s = int(s)
                seg = lab[s::P].copy()
                src_idx, dst_idx, _w, _d = _load_slice(
                    resident_dir, epoch, s)
                if dst_idx.size:
                    np.minimum.at(seg, np.asarray(dst_idx) // P, lab[src_idx])
                rs, rd = _load_rslice(resident_dir, epoch, s)
                if rs.size:
                    np.minimum.at(seg, np.asarray(rs) // P, lab[rd])
                yield pd.DataFrame({"slice": [s], "seg": [seg.tobytes()]})

    return fn


def _lpa_vote_fn(resident_dir: str, epoch: str, n: int, n_slices: int, lab_bc):
    """One synchronous label-propagation round for slice ``s``: each owner
    vertex adopts the most frequent label among its DEDUPLICATED undirected
    neighbors (in-neighbors from the base slice, out-neighbors from the
    reverse slice), ties broken by the smallest label — exactly the join
    path's semantics. The per-slice (owner, neighbor) set is built once and
    cached in the worker process (graph-static)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lab = lab_bc.value
        P = n_slices
        for pdf in batches:
            for s in pdf["id"].to_numpy():
                s = int(s)
                key = (epoch, "lpa", s)
                pairs = _cache_get(key)
                if pairs is None:
                    src_idx, dst_idx, _w, _d = _load_slice(
                        resident_dir, epoch, s)
                    parts = []
                    if dst_idx.size:
                        ds = np.asarray(src_idx, dtype=np.int64)
                        dd = np.asarray(dst_idx, dtype=np.int64)
                        keep = ds != dd
                        parts.append((dd[keep] // P) * n + ds[keep])
                    rs, rd = _load_rslice(resident_dir, epoch, s)
                    if rs.size:
                        rs = np.asarray(rs, dtype=np.int64)
                        rd = np.asarray(rd, dtype=np.int64)
                        keep = rs != rd
                        parts.append((rs[keep] // P) * n + rd[keep])
                    if parts:
                        uniq = np.unique(np.concatenate(parts))
                        pairs = (uniq // n, uniq % n)  # (owner_seg, neighbor)
                    else:
                        pairs = (np.empty(0, np.int64), np.empty(0, np.int64))
                    _cache_put(key, pairs)
                owner, nbr = pairs
                seg = lab[s::P].copy()
                if owner.size:
                    votes = owner * n + lab[nbr]
                    vu, cnt = np.unique(votes, return_counts=True)
                    vo, vl = vu // n, vu % n
                    order = np.lexsort((vl, -cnt, vo))
                    _, first = np.unique(vo[order], return_index=True)
                    win = order[first]
                    seg[vo[win]] = vl[win]
                yield pd.DataFrame({"slice": [s], "seg": [seg.tobytes()]})

    return fn


def _hits_gather_fn(resident_dir: str, epoch: str, n_slices: int, vec_bc,
                    direction: str):
    """One HITS half-superstep for slice ``s`` (float64 analogue of
    ``_cc_min_fn``): direction='auth' sums the broadcast hub vector over
    in-edges into each owner vertex (base dst-residue slice);
    direction='hub' sums the broadcast auth vector over out-edges
    (reverse src-residue slice). Emits the compact unnormalized segment;
    the driver L1-normalizes after reassembly."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vec = vec_bc.value
        P = n_slices
        for pdf in batches:
            for s in pdf["id"].to_numpy():
                s = int(s)
                seg = np.zeros_like(vec[s::P])
                if direction == "auth":
                    src_idx, dst_idx, _w, _d = _load_slice(
                        resident_dir, epoch, s)
                    if dst_idx.size:
                        np.add.at(seg, np.asarray(dst_idx) // P, vec[src_idx])
                else:
                    rs, rd = _load_rslice(resident_dir, epoch, s)
                    if rs.size:
                        np.add.at(seg, np.asarray(rs) // P, vec[rd])
                yield pd.DataFrame({"slice": [s], "seg": [seg.tobytes()]})

    return fn


def dense_label_loop(graph, dense, make_fn, *, post=None, rounds=None,
                     max_iterations=200, store=None, mode="labels",
                     init=None, start_iter=0, run_id=None):
    """Shared driver for dense label-vector kernels (CC, LPA): per round,
    broadcast the int64 label vector, run ``make_fn(dg, lab_bc)`` as one
    narrow job over the resident slices, reassemble the compact segments,
    apply ``post`` (e.g. pointer jumping), and either run exactly
    ``rounds`` rounds or stop at the fixpoint. Requires gen-0 slices
    (label propagation cannot subtract deleted edges). Returns
    (dg, labels); the caller owns ``dg`` cleanup when it passed
    ``dense=None``.

    Checkpoint/resume (same contract as the rank loop): pass a
    ``CheckpointStore`` as ``store`` and every completed round commits the
    label state (id, label) plus a metrics row (labels-changed count in
    ``delta_linf``) under ``iter=K``. To resume, pass ``init`` (the dense
    label-index vector reconstructed from the last committed state) and
    ``start_iter`` so round numbering continues; ``rounds``/
    ``max_iterations`` count REMAINING rounds, as in ``resume_arrow``."""
    import time as _time
    import uuid as _uuid

    from ..session import adaptive_execution

    dg = dense or DenseGraph(graph)
    if dg.overlays:
        raise ValueError(
            "dense label kernels need gen-0 slices — rebuild the dense view "
            "via build_graph + DenseGraph after applying batches")
    dg.materialize()
    dg.materialize_reverse()
    spark = graph.edges.sparkSession
    sc = spark.sparkContext
    n, P = dg.n, dg.n_slices
    slice_df = spark.range(0, P, 1, P)
    if init is not None:
        lab = np.asarray(init, dtype=np.int64).copy()
        if lab.shape != (n,):
            raise ValueError(
                f"resume labels have {lab.shape[0]} entries, graph has {n}")
    else:
        lab = np.arange(n, dtype=np.int64)
    rid = run_id or _uuid.uuid4().hex[:12]
    limit = rounds if rounds is not None else max_iterations
    with adaptive_execution(spark, False):
        for k in range(limit):
            t0 = _time.monotonic()
            lab_bc = sc.broadcast(lab)
            parts = slice_df.mapInPandas(
                make_fn(dg, lab_bc), "slice int, seg binary"
            ).toPandas()
            new = np.empty_like(lab)
            for s, blob in zip(parts["slice"], parts["seg"]):
                new[int(s)::P] = np.frombuffer(blob, dtype=np.int64)
            lab_bc.destroy()
            if post is not None:
                new = post(new)
            changed = int((new != lab).sum())
            if store is not None:
                from ..checkpoint import METRICS_SCHEMA

                it = start_iter + k + 1
                ldf = spark.createDataFrame(
                    pd.DataFrame({"id": dg.ids, "label": dg.ids[new]}))
                mdf = spark.createDataFrame(
                    [(rid, mode, it, -1, n, graph.num_edges, float(changed),
                      (_time.monotonic() - t0) * 1000.0)],
                    METRICS_SCHEMA,
                )
                store.save(it, ldf, metrics=mdf,
                           extra={"run_id": rid, "mode": mode, "n": n,
                                  "m": graph.num_edges, "changed": changed})
            if rounds is None and changed == 0:
                break
            lab = new
    return dg, lab


def load_label_checkpoint(graph, dense, store, expect_mode=None):
    """Reconstruct (dense graph, init label-index vector, last committed
    iteration, run_id) from a label-kernel checkpoint written by
    :func:`dense_label_loop`. Fails loudly instead of silently relabeling
    when the checkpoint does not match: wrong kernel (``expect_mode`` vs
    the committed ``mode`` — CC labels are not an LPA state and vice
    versa), different vertex count/ids, different edge count (same
    vertices but a changed edge set invalidates label monotonicity), or
    labels referencing unknown ids."""
    it = store.latest()
    if it is None:
        raise FileNotFoundError(f"no committed iteration under {store.root}")
    info = store.commit_info(it)
    if expect_mode is not None and info.get("mode") not in (None, expect_mode):
        raise ValueError(
            f"checkpoint was written by a {info['mode']!r} run — refusing "
            f"to resume a {expect_mode!r} kernel from it")
    # cheap scalar checks BEFORE materializing the dense view (a mismatch
    # must not leave freshly-built slice files / a persisted frame behind)
    if info.get("n") is not None and int(info["n"]) != graph.num_vertices:
        raise ValueError(
            f"checkpoint has n={info['n']} vertices but the graph has "
            f"{graph.num_vertices} — refusing to resume against a "
            "different graph")
    if info.get("m") is not None and int(info["m"]) != graph.num_edges:
        raise ValueError(
            f"checkpoint has m={info['m']} edges but the graph has "
            f"{graph.num_edges} — refusing to resume against a different "
            "graph (same vertices, changed edge set)")
    dg = dense or DenseGraph(graph)
    try:
        dg.materialize()
        spark = graph.edges.sparkSession
        pdf = store.load_ranks(spark, it).toPandas().sort_values("id")
        if not np.array_equal(pdf["id"].to_numpy(), dg.ids):
            raise ValueError(
                "checkpointed vertex ids differ from the graph's — refusing "
                "to resume against a different graph")
        lab_ids = pdf["label"].to_numpy()
        init = np.minimum(np.searchsorted(dg.ids, lab_ids), dg.n - 1)
        if not np.array_equal(dg.ids[init], lab_ids):
            raise ValueError(
                "checkpointed labels reference unknown vertex ids")
    except Exception:
        if dense is None:
            dg.unpersist()
        raise
    return dg, init, it, info.get("run_id")


def _resident_expand_fn(resident_dir: str, epoch: str, overlays: tuple,
                        movers_bc):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = movers_bc.value[0]  # (mask, idx) pair; walk by mask here
        outs = []
        for pdf in batches:
            for s in pdf["id"].to_numpy():
                src_idx, dst_idx, _w, deltas = _load_slice(
                    resident_dir, epoch, int(s), overlays)
                # expansion walks live out-edges: base + inserted (deleted
                # edges no longer push their dst, matching the updated graph)
                for ds, dd, _w2, sign in (
                        [(src_idx, dst_idx, None, 1.0)] + deltas):
                    if sign > 0 and ds.size:
                        outs.append(np.unique(dd[m[ds]]))
        sel = np.unique(np.concatenate(outs)) if outs else np.empty(0, np.int32)
        yield pd.DataFrame({"dst_idx": sel})

    return fn


def _norm(delta: np.ndarray, kind: str) -> float:
    if kind == "L1":
        return float(np.sum(np.abs(delta)))
    if kind == "L2":
        return float(np.sum(delta * delta))
    return float(np.max(np.abs(delta))) if delta.size else 0.0


def pagerank_arrow(
    graph: LinkGraph,
    opts: PageRankOptions | None = None,
    init: DataFrame | None = None,
    dense: DenseGraph | None = None,
    frontier: DataFrame | None = None,
    resident: bool | None = None,
    personalization: DataFrame | None = None,
    start_iteration: int = 0,
) -> PageRankResult:
    """Dense Arrow-kernel PageRank: static (init=None), naive-dynamic
    (init=prev ranks), or dynamic-frontier (frontier=(id,) seed set).

    ``start_iteration`` continues a resumed run's iteration numbering
    (``resume_arrow`` passes the loaded checkpoint's iteration, exactly
    like the join-agg path): checkpoint saves keep ascending instead of
    renumbering from 1 into the same root, so ``CheckpointStore.latest``
    never points back at a stale pre-resume segment. The result's
    ``iterations`` counts only the supersteps THIS call ran.

    ``resident=None`` auto-selects: graphs above ~500k edges get
    materialized slice files + resident supersteps (no per-superstep edge
    streaming); smaller graphs use the streaming kernel directly.

    ``personalization`` (id, p): vector teleport, normalized to sum 1 —
    same semantics as :func:`..pagerank.pagerank`. Weighted graphs
    (``graph.weighted``) broadcast q = r and read the pre-normalized
    transition weight from the block.

    Same semantics/defaults as :func:`..pagerank.pagerank`; ranks match the
    join-agg path and the NumPy oracle to FP precision.
    """
    o = opts or PageRankOptions()
    d, tol = o.damping, o.tolerance
    D = o.frontier_tolerance_factor * tol
    dg = dense or DenseGraph(graph)
    own_dense = dense is None
    spark = graph.edges.sparkSession
    sc = spark.sparkContext
    n = dg.n
    run_id = o.run_id or uuid.uuid4().hex[:12]
    store = CheckpointStore(o.checkpoint_dir) if o.checkpoint_dir else None
    mode = "static" if init is None and frontier is None else (
        "dynamic-frontier" if frontier is not None else "naive-dynamic")

    if resident is None:
        resident = dg.resident_dir is not None or graph.num_edges > 500_000
    if dg.overlays and not resident:
        raise ValueError("delta-overlay DenseGraph views require resident mode")
    if not resident and dg.blocks is None:
        raise ValueError(
            "a DenseGraph restored with DenseGraph.load has slice files "
            "only — run with resident=True (or rebuild for streaming mode)")
    if resident and dg.resident_dir is None:
        dg.materialize()
    if resident and frontier is not None:
        # frontier-masked supersteps read the dst-sorted mmap files
        dg.materialize_masked()
    gs_mode = o.async_updates
    if gs_mode:
        if gs_mode not in ("slice", "shared"):
            raise ValueError("async_updates must be None, 'slice' or 'shared'")
        if not resident:
            raise ValueError("async_updates requires the resident kernel "
                             "(resident=True)")
        if personalization is not None:
            raise ValueError("async_updates supports the uniform teleport "
                             "only (reference ASYNC has no vector teleport)")
        if gs_mode == "shared" and not sc.master.startswith("local"):
            # the mmap'd shared rank buffer is the reference's single-node
            # shared-memory model (pagerank.hxx:255-310) verbatim: every
            # writer must see the same file. On a multi-node master the
            # driver-local resident_dir either fails on executors or, over
            # NFS, has no write-coherence guarantee — refuse rather than
            # silently degrade the barrier-free mix.
            raise ValueError(
                "async_updates='shared' requires a single-host master "
                f"(local[N]); got {sc.master!r} — use async_updates='slice' "
                "on a cluster (cluster-safe chunked Gauss-Seidel)")
    faulted = (o.fault_crash_prob > 0.0
               or (o.fault_sleep_prob > 0.0 and o.fault_sleep_ms > 0))
    if faulted and not resident:
        raise ValueError("fault injection targets the resident kernels "
                         "(resident=True)")
    if o.fault_crash_prob > 0.0:
        # crash faults are recovered by task RETRY; a master without a
        # retry budget (plain local[N] = maxFailures 1) would fail the
        # whole job on the first injected crash — refuse upfront
        m = sc.master
        if m.startswith("local") and "," not in m:
            raise ValueError(
                "fault_crash_prob needs task retries: use "
                "get_spark(task_retries=...) (master local[N,F]) or "
                "spark.task.maxFailures > 1 on a cluster")
    slice_df = (
        spark.range(0, dg.n_slices, 1, dg.n_slices) if resident else None
    )

    # init rank vector (driver-side dense)
    # dg.ids is sorted -> vectorized id->idx via searchsorted
    def _to_idx(ids: np.ndarray) -> np.ndarray:
        i = np.searchsorted(dg.ids, ids)
        ok = (i < n) & (dg.ids[np.minimum(i, n - 1)] == ids)
        return i[ok]

    if init is None:
        r = np.full(n, 1.0 / n)
    else:
        with adaptive_execution(spark, o.adaptive_supersteps):
            pdf = init.toPandas()
        r = np.full(n, 1.0 / n)
        ids_arr = pdf["id"].to_numpy()
        i = np.searchsorted(dg.ids, ids_arr)
        ok = (i < n) & (dg.ids[np.minimum(i, n - 1)] == ids_arr)
        r[i[ok]] = pdf["rank"].to_numpy()[ok]

    affected: np.ndarray | None = None
    active: np.ndarray | None = None
    if frontier is not None:
        affected = np.zeros(n, dtype=bool)
        with adaptive_execution(spark, o.adaptive_supersteps):
            fr_ids = frontier.toPandas()["id"].to_numpy()
        affected[_to_idx(fr_ids)] = True
        if o.contracting:
            # per-vertex convergence flags (pagerankBarrierfree e[v],
            # src/pagerankBarrierfree.hxx:68-122): the live set shrinks as
            # vertices' deltas drop below tol, re-enters on neighbor push
            active = affected.copy()

    dead_mode = o.dead_end_teleport and not graph.self_loops
    dead = dg.dead_mask() if dead_mode else None
    inv_deg = dg.inv_deg()

    pv: np.ndarray | None = None
    if personalization is not None:
        ppdf = personalization.select("id", "p").toPandas()
        pv = np.zeros(n)
        ids_arr = ppdf["id"].to_numpy()
        i = np.searchsorted(dg.ids, ids_arr)
        ok = (i < n) & (dg.ids[np.minimum(i, n - 1)] == ids_arr)
        pv[i[ok]] = ppdf["p"].to_numpy()[ok]
        tot = float(pv.sum())
        if tot <= 0.0:
            raise ValueError("personalization weights must sum to > 0")
        pv /= tot
        mode = f"personalized-{mode}"
        if store is not None:
            store.save_personalization(personalization.select("id", "p"))

    metrics: list[dict] = []
    err = float("inf")
    it = start_iteration
    t0 = time.monotonic()
    # async (Gauss-Seidel / barrier-free) state: the inverse out-degree
    # vector is graph-static — broadcast ONCE per run, not per superstep;
    # shared mode additionally publishes the rank vector as an mmap'd
    # buffer next to the slice files (single host, like the reference)
    # FUSED full-sweep path (static/naive-dynamic, uniform teleport): the
    # slice tasks apply the rank update + norm reduction themselves
    # (_resident_update_fn) — the driver only places segments and combines
    # P scalars, shrinking the per-superstep serial term.
    fused = bool(resident and gs_mode is None and frontier is None
                 and personalization is None)
    # FUSED frontier path (resident sync dynamic, scalar teleport): the
    # masked scatter tasks apply the rank update themselves and emit new
    # rank values (sparse for small frontiers) — _resident_scatter_fn.
    fused_frontier = bool(resident and gs_mode is None
                          and frontier is not None and personalization is None)
    ivd_bc = None
    shared_path = None
    if resident and not dg.weighted:
        # run-static 1/outdeg broadcast: every resident kernel gathers
        # per-edge factors from the cached slice forms
        ivd_bc = sc.broadcast(inv_deg)
    if gs_mode == "shared":
        shared_path = f"{dg.resident_dir}/async_r_{run_id}.npy"
        np.save(shared_path, r)
    # resident dynamic mode fuses frontier expansion into the NEXT
    # superstep's scatter (one distributed job per superstep instead of
    # two). The async path ships the previous superstep's movers as its
    # own broadcast (pending_movers_bc); the sync scatter packs them into
    # the superstep's single state broadcast (pending_movers arrays).
    pending_movers_bc = None
    pending_movers: tuple | None = None
    with adaptive_execution(spark, o.adaptive_supersteps):
        while it < o.max_iterations:
            t_it = time.monotonic()
            s_dead = float(r[dead].sum()) if dead_mode else 0.0
            if pv is None:
                c0 = (1.0 - d) / n + d * s_dead / n
            else:
                c0 = ((1.0 - d) + d * s_dead) * pv  # vector teleport
            # fold the out-degree weight into the broadcast: q = r / outdeg
            # (weighted blocks carry w = weight/Σout-weights, so q = r).
            # async modes broadcast r itself (the kernel gathers 1/outdeg
            # from the run-static ivd broadcast so it can keep updating its
            # own sources mid-pass); shared mode ships NO rank state at all
            # — workers read/write the mmap'd buffer.
            scope = active if o.contracting and active is not None else affected
            if gs_mode or fused:
                ranks_bc = (sc.broadcast(r) if shared_path is None else None)
            elif resident:
                # ONE per-superstep broadcast for the resident scatter:
                # (r, scope, movers). A broadcast create/destroy round-trip
                # costs ~30-40 ms of driver RPC in local mode — the frontier
                # path used to pay three per superstep, which dominated its
                # fixed cost at sparse frontiers
                ranks_bc = sc.broadcast((r, scope, pending_movers))
            else:
                ranks_bc = sc.broadcast(r if dg.weighted else r * inv_deg)
            mask_bc = (sc.broadcast(scope)
                       if scope is not None and (gs_mode or not resident)
                       else None)
            acc = (np.zeros(n)
                   if not (fused or (fused_frontier and resident)) else None)
            new_r: np.ndarray | None = None
            fused_norms: tuple[float, float, float] | None = None
            slice_edges: dict[int, int] = {}
            # this superstep's number is it+1 (incremented below); the
            # fault tuple pins the injection to (seed, superstep, slice)
            fault = ((o.fault_crash_prob, o.fault_sleep_prob,
                      o.fault_sleep_ms, o.fault_seed, it + 1)
                     if faulted else None)
            if resident:
                if gs_mode:
                    kernel = _gs_update_fn(
                        dg.resident_dir, dg.epoch, n, dg.n_slices,
                        dg.overlays,
                        dg.weighted, d, float(c0) if pv is None else 0.0,
                        ranks_bc, ivd_bc, mask_bc, pending_movers_bc,
                        o.async_chunks, shared_path, o.async_sweeps,
                        fault=fault)
                elif fused:
                    kernel = _resident_update_fn(
                        dg.resident_dir, dg.epoch, n, dg.n_slices,
                        dg.overlays,
                        dg.weighted, d, float(c0), ranks_bc, ivd_bc,
                        fault=fault)
                else:
                    kernel = _resident_scatter_fn(
                        dg.resident_dir, dg.epoch, n, dg.n_slices,
                        dg.overlays,
                        ranks_bc,
                        weighted=dg.weighted, ivd_bc=ivd_bc, d=d,
                        c0=(float(c0) if fused_frontier else None),
                        D=D, tol=tol,
                        contracting=bool(o.contracting and active is not None),
                        fault=fault)
                if fused:
                    schema = ("slice int, acc binary, m long, e1 double, "
                              "e2 double, ei double")
                elif gs_mode:
                    schema = "slice int, acc binary, m long, exp binary"
                else:
                    schema = ("slice int, acc binary, idx binary, m long, "
                              "exp binary, mov binary, keep binary, "
                              "nact long, e1 double, e2 double, ei double")
                parts = slice_df.mapInPandas(kernel, schema).toPandas()
                P = dg.n_slices
                if gs_mode:
                    # async kernels emit NEW rank segments, not accumulators
                    new_r = r.copy()
                    for s, blob, m_e in zip(parts["slice"], parts["acc"],
                                            parts["m"]):
                        new_r[int(s)::P] = np.frombuffer(blob, dtype=np.float64)
                        slice_edges[int(s)] = int(m_e)
                elif fused:
                    new_r = np.empty(n)
                    for s, blob, m_e in zip(parts["slice"], parts["acc"],
                                            parts["m"]):
                        new_r[int(s)::P] = np.frombuffer(blob, dtype=np.float64)
                        slice_edges[int(s)] = int(m_e)
                    fused_norms = (float(parts["e1"].sum()),
                                   float(parts["e2"].sum()),
                                   float(parts["ei"].max()))
                elif scope is not None:
                    # frontier mode: sparse slices emit (idx, val) pairs,
                    # dense (flooded) slices a full segment with empty idx.
                    # With the fused update the values ARE new ranks —
                    # place them IN PLACE over r (the broadcast pickled the
                    # old values; no driver copy) and combine the per-slice
                    # norm/mover/keep partials; else raw accumulators.
                    if fused_frontier:
                        ff_rows = 0
                        ff_e1 = ff_e2 = ff_ei = 0.0
                        ff_mov: list = []
                        ff_keep: list = []
                        for (s, blob, ib, m_e, na, mv, kp, p1, p2, pi) in zip(
                                parts["slice"], parts["acc"], parts["idx"],
                                parts["m"], parts["nact"], parts["mov"],
                                parts["keep"], parts["e1"], parts["e2"],
                                parts["ei"]):
                            if len(ib):
                                r[np.frombuffer(ib, dtype=np.int64)] = \
                                    np.frombuffer(blob, dtype=np.float64)
                            elif len(blob):
                                r[int(s)::P] = np.frombuffer(
                                    blob, dtype=np.float64)
                            if len(mv):
                                ff_mov.append(np.frombuffer(mv, np.int64))
                            if len(kp):
                                ff_keep.append(np.frombuffer(kp, np.int64))
                            ff_rows += int(na)
                            ff_e1 += float(p1)
                            ff_e2 += float(p2)
                            ff_ei = max(ff_ei, float(pi))
                            slice_edges[int(s)] = int(m_e)
                        new_r = r
                    else:
                        for s, blob, ib, m_e in zip(
                                parts["slice"], parts["acc"], parts["idx"],
                                parts["m"]):
                            if len(ib):
                                acc[np.frombuffer(ib, dtype=np.int64)] = \
                                    np.frombuffer(blob, dtype=np.float64)
                            elif len(blob):
                                acc[int(s)::P] = np.frombuffer(
                                    blob, dtype=np.float64)
                            slice_edges[int(s)] = int(m_e)
                else:
                    for s, blob, m_e in zip(parts["slice"], parts["acc"],
                                            parts["m"]):
                        acc[int(s)::P] = np.frombuffer(blob, dtype=np.float64)
                        slice_edges[int(s)] = int(m_e)
                if affected is not None and (pending_movers_bc is not None
                                             or pending_movers is not None):
                    # fold the worker-side expansions into the affected set;
                    # their accumulators are already complete (each slice
                    # widened its own mask before scattering)
                    exps = [np.frombuffer(b, dtype=np.int32)
                            for b in parts["exp"] if len(b)]
                    if exps:
                        exp_all = np.concatenate(exps)
                        affected[exp_all] = True
                        if o.contracting and active is not None:
                            active[exp_all] = True
            else:
                parts = dg.blocks.mapInPandas(
                    _scatter_fn(dg.epoch, n, ranks_bc, mask_bc), "acc binary"
                ).toPandas()
                for blob in parts["acc"]:
                    acc += np.frombuffer(blob, dtype=np.float64)
            if new_r is None:
                new_r = c0 + d * acc
            ff = fused_frontier and resident
            if ff:
                delta = None  # update/norms/movers computed in the tasks
                rows = ff_rows
            elif affected is not None:
                # frontier semantics: only in-scope vertices update
                # (pagerankCalculateRanks fa filter, src/pagerank.hxx:229-256)
                upd = scope
                new_full = r.copy()
                new_full[upd] = new_r[upd]
                delta = np.abs(new_full - r)
                rows = int(upd.sum())
                new_r = new_full
            elif fused_norms is not None:
                delta = None  # norms reduced inside the parallel stage
                rows = n
            else:
                delta = np.abs(new_r - r)
                rows = n
            it += 1
            if ff:
                err = {"L1": ff_e1, "L2": ff_e2,
                       "Li": ff_ei}[o.tolerance_norm]
                linf = ff_ei
            elif fused_norms is not None:
                e1, e2, ei = fused_norms
                err = {"L1": e1, "L2": e2, "Li": ei}[o.tolerance_norm]
                linf = ei
            else:
                err = _norm(delta[scope] if affected is not None else delta,
                            o.tolerance_norm)
                linf = float(np.max(delta)) if delta.size else 0.0

            if ff:
                # movers for the next superstep and the contracting
                # survivor set were computed inside the tasks
                pending_movers = None
                if ff_mov:
                    mcat = np.concatenate(ff_mov)
                    mmask = np.zeros(n, dtype=bool)
                    mmask[mcat] = True
                    midx = np.flatnonzero(mmask)
                    pending_movers = (mmask,
                                      midx if midx.size * 16 < n else None)
                if o.contracting and active is not None:
                    # equivalent to the legacy fold-then-filter: keep =
                    # (updated positions with delta > tol); the exp fold
                    # above already matches the legacy ordering
                    active[:] = False
                    if ff_keep:
                        active[np.concatenate(ff_keep)] = True
            elif affected is not None:
                movers_mask = delta > D
                if pending_movers_bc is not None:
                    pending_movers_bc.destroy()
                    pending_movers_bc = None
                pending_movers = None
                if resident:
                    # fused expansion: ship the movers (mask + sorted index
                    # array — the sync kernel walks the src-sorted live-edge
                    # view by index, the async kernel gathers by mask) with
                    # the NEXT superstep's scatter instead of a separate job
                    if movers_mask.any():
                        midx = np.flatnonzero(movers_mask).astype(np.int64)
                        # ship the index array only while it is small — a
                        # flooded movers set would add 8N bytes to the
                        # broadcast for a path the kernel won't take
                        mm = (movers_mask,
                              midx if midx.size * 16 < n else None)
                        if gs_mode:
                            pending_movers_bc = sc.broadcast(mm)
                        else:
                            pending_movers = mm  # rides the state broadcast
                    if o.contracting and active is not None:
                        active &= delta > tol  # converged drop out; neighbor
                        # push re-activates when the expansion folds in
                elif movers_mask.any():
                    # frontier expansion (fr): out-neighbors of movers, via a
                    # distributed masked scan of the cached edge blocks
                    movers_bc = sc.broadcast(movers_mask)

                    def expand_fn(batches: Iterator[pd.DataFrame],
                                  _mb=movers_bc) -> Iterator[pd.DataFrame]:
                        m = _mb.value
                        for pdf in batches:
                            s = pdf["src_idx"].to_numpy()
                            t = pdf["dst_idx"].to_numpy()
                            yield pd.DataFrame({"dst_idx": np.unique(t[m[s]])})

                    src_df = dg.blocks.mapInPandas(expand_fn, "dst_idx int")
                    exp = src_df.distinct().toPandas()["dst_idx"].to_numpy()
                    affected[exp] = True
                    if o.contracting and active is not None:
                        active &= delta > tol  # per-vertex converged drop out
                        active[exp] = True     # neighbor push re-activates
                    movers_bc.destroy()
                elif o.contracting and active is not None:
                    active &= delta > tol
            r = new_r
            if ranks_bc is not None:  # shared async mode ships no rank state
                ranks_bc.destroy()
            if mask_bc is not None:
                mask_bc.destroy()

            ms = (time.monotonic() - t_it) * 1000.0
            if o.metrics_level != "none":
                metrics.append(
                    dict(run_id=run_id, mode=f"arrow-{mode}", iteration=it,
                         partition_id=-1, rows_processed=rows,
                         edges_processed=graph.num_edges, delta_linf=linf,
                         elapsed_ms=ms)
                )
                if o.metrics_level == "partition" and slice_edges:
                    # per-slice lineage: which slice processed how many edges
                    metrics.extend(
                        dict(run_id=run_id, mode=f"arrow-{mode}", iteration=it,
                             partition_id=s, rows_processed=-1,
                             edges_processed=m_e, delta_linf=-1.0, elapsed_ms=-1.0)
                        for s, m_e in sorted(slice_edges.items())
                    )
            if store and (it % o.checkpoint_every == 0):
                if affected is not None and (pending_movers_bc is not None
                                             or pending_movers is not None):
                    # materialize the fused expansion before persisting the
                    # frontier, so a resumed run restores the complete
                    # affected set (the movers mask itself is not saved)
                    mv_bc = pending_movers_bc or sc.broadcast(pending_movers)
                    exp = (
                        slice_df.mapInPandas(
                            _resident_expand_fn(dg.resident_dir, dg.epoch,
                                                dg.overlays, mv_bc),
                            "dst_idx int",
                        ).distinct().toPandas()["dst_idx"].to_numpy()
                    )
                    affected[exp] = True
                    if o.contracting and active is not None:
                        active[exp] = True
                    mv_bc.destroy()
                    pending_movers_bc = None
                    pending_movers = None
                rdf = spark.createDataFrame(
                    pd.DataFrame({"id": dg.ids, "rank": r}))
                fdf = None
                if affected is not None:
                    fdf = spark.createDataFrame(
                        pd.DataFrame({"id": dg.ids[affected]}))
                mdf = None
                if o.metrics_level != "none" and metrics:
                    from ..checkpoint import METRICS_SCHEMA

                    mdf = spark.createDataFrame(
                        [tuple(m[f.name] for f in METRICS_SCHEMA.fields)
                         for m in metrics],
                        METRICS_SCHEMA,
                    )
                store.save(it, rdf, fdf, mdf,
                           extra={"run_id": run_id, "mode": f"arrow-{mode}",
                                  "err": err})
            if err < tol:
                break
            if (o.contracting and active is not None and not active.any()
                    and pending_movers_bc is None and pending_movers is None):
                # a pending movers mask could still re-activate vertices at
                # the next superstep's fused expansion — only stop when none
                break

    if pending_movers_bc is not None:
        pending_movers_bc.destroy()
    if ivd_bc is not None:
        ivd_bc.destroy()
    if shared_path is not None:
        try:
            os.remove(shared_path)
        except OSError:
            pass
    ranks_df = spark.createDataFrame(pd.DataFrame({"id": dg.ids, "rank": r}))
    if own_dense:
        dg.unpersist()
    return PageRankResult(ranks=ranks_df, iterations=it - start_iteration,
                          err=err, time_s=time.monotonic() - t0,
                          metrics=metrics)


def resume_arrow(
    graph: LinkGraph,
    opts: PageRankOptions,
    dense: DenseGraph | None = None,
) -> PageRankResult:
    """Continue a checkpointed Arrow-kernel run from its latest committed
    superstep (north rule: runs resume mid-convergence). The rank vector
    (and frontier, for dynamic runs) reload from the checkpoint store; the
    dense view rebuilds from the persisted graph (or is passed in)."""
    if not opts.checkpoint_dir:
        raise ValueError("resume_arrow requires opts.checkpoint_dir")
    store = CheckpointStore(opts.checkpoint_dir)
    it = store.latest()
    if it is None:
        raise FileNotFoundError(
            f"no committed iteration under {opts.checkpoint_dir}")
    spark = graph.edges.sparkSession
    ranks = store.load_ranks(spark, it)
    frontier = store.load_frontier(spark, it)
    info = store.commit_info(it)
    from dataclasses import replace

    o = replace(opts, run_id=info.get("run_id"))
    # start_iteration continues the committed numbering: saves keep
    # ascending in the same root (latest() stays monotone across resume
    # segments) and the remaining-superstep budget falls out of the
    # unchanged `while it < max_iterations` guard
    res = pagerank_arrow(graph, o, init=ranks, frontier=frontier, dense=dense,
                         personalization=store.load_personalization(spark),
                         start_iteration=it)
    return res


def pagerank_auto(
    graph: LinkGraph,
    opts: PageRankOptions | None = None,
    init: DataFrame | None = None,
    personalization: DataFrame | None = None,
    **arrow_kw,
) -> PageRankResult:
    """Physical-plan selector for static / naive-dynamic PageRank: the
    dense Arrow kernel while its O(N) driver-resident state fits
    ``DRIVER_STATE_BUDGET`` (N ≈ 1e8-1e9 at the default 16 GiB — every
    web graph the reference runs), else the fully-sharded join-agg plan
    (``plans.pagerank.pagerank``) with NO driver-side vertex state. Both
    produce identical ranks (same recurrence, same stop rule), so this is
    a pure planning decision — the cluster-scale guard the design note in
    BENCH/BASELINE.md §1 calls for.

    ``arrow_kw`` (dense= / resident= / frontier=) are Arrow-path knobs:
    passing one while the budget forces the join-agg fallback raises
    rather than silently ignoring it (dynamic-frontier callers pick their
    plan explicitly — ``plans.pagerank.pagerank_dynamic_frontier`` is the
    sharded counterpart)."""
    if dense_state_fits(graph.num_vertices):
        return pagerank_arrow(graph, opts, init=init,
                              personalization=personalization, **arrow_kw)
    if arrow_kw:
        raise ValueError(
            f"pagerank_auto: {sorted(arrow_kw)} are dense-kernel options, "
            f"but {graph.num_vertices} vertices exceed the driver-state "
            "budget (SPARK_GRAFT_DRIVER_STATE_BUDGET) and the run falls "
            "back to the join-agg plan — drop them or call pagerank_arrow "
            "explicitly")
    from .pagerank import pagerank

    return pagerank(graph, opts, init=init, personalization=personalization)
