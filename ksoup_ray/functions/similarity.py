"""Similarity search over an embedding column (``list<float>``).

* ``brute_force_topk`` — baseline: broadcast the query matrix once with
  ``ray.put`` and do a numpy matmul per batch (each batch sees the
  queries without reshipping them); exact.
* ``ivf_topk`` — scale path: k-means-lite coarse quantizer (centroids
  fit on a driver-side sample), each vector assigned to its nearest
  centroid; queries probe only ``nprobe`` inverted lists → the matmul
  touches a fraction of the data. Same output schema as brute force.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def vecs_from_arrow(col, dtype=np.float64) -> np.ndarray:
    """(n, d) matrix from a ``list<float>`` / ``fixed_size_list`` Arrow
    column — ZERO-COPY from the values buffer (no ``to_pylist`` Python
    object round-trip; the only copy is the requested dtype upcast).
    Raises on ragged rows (embeddings must be fixed-dim)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=dtype)
    if isinstance(col, pa.FixedSizeListArray):
        d = col.type.list_size
        flat = col.values.to_numpy(zero_copy_only=False)
        off = col.offset * d
        m = flat[off:off + n * d].reshape(n, d)
    else:
        offs = np.asarray(col.offsets)        # slice-adjusted (n+1,)
        widths = np.diff(offs)
        d = int(widths[0])
        if not (widths == d).all():
            raise ValueError("ragged embedding column (rows of unequal "
                             "length)")
        flat = col.values.to_numpy(zero_copy_only=False)
        m = flat[offs[0]:offs[-1]].reshape(n, d)
    return m.astype(dtype, copy=False)


class BruteForceScorer:
    """Actor: the broadcast query matrix is fetched ONCE per actor in
    __init__ (ray.put on the driver → zero-copy reads here)."""

    def __init__(self, queries_ref, k: int, vec_col: str = "embedding",
                 id_col: str = "vec_id"):
        import ray
        queries = ray.get(queries_ref) if not isinstance(queries_ref,
                                                         np.ndarray) \
            else queries_ref
        self.queries = _normalize(np.asarray(queries, dtype=np.float32))
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = vecs_from_arrow(batch.column(self.vec_col), np.float32)
        ids = np.asarray(batch.column(self.id_col).to_pylist())
        unit = _normalize(vecs)
        sims = unit @ self.queries.T  # (batch, Q)
        q_ids: list[int] = []
        v_ids: list = []
        scores: list[float] = []
        for q in range(self.queries.shape[0]):
            col = sims[:, q]
            top = min(self.k, len(col))
            idx = np.argpartition(-col, top - 1)[:top]
            for i in idx:
                q_ids.append(q)
                v_ids.append(ids[i])
                scores.append(float(col[i]))
        return pa.table({
            "query_id": pa.array(q_ids, pa.int32()),
            self.id_col: pa.array(v_ids),
            "cosine": pa.array(scores, pa.float64()),
        })


def brute_force_topk(ds, queries: np.ndarray, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     concurrency=(1, 4)):
    """Exact cosine top-k of each query against the whole dataset.

    Per-batch partial top-k (map_batches, broadcast queries) → tiny
    global reduce per query — the combiner pattern: only k*Q*batches
    candidate rows shuffle, never the embeddings.
    """
    import ray

    q_ref = ray.put(np.asarray(queries, dtype=np.float32))
    partial = ds.map_batches(
        BruteForceScorer,
        fn_constructor_kwargs=dict(queries_ref=q_ref, k=k, vec_col=vec_col,
                                   id_col=id_col),
        batch_format="pyarrow", concurrency=concurrency)

    def global_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.nlargest(k, "cosine")

    return partial.groupby("query_id").map_groups(global_topk,
                                                  batch_format="pandas")


class SeededIVFScorer:
    """Actor for ``ivf_topk_seeded``: holds the (broadcast) centroid and
    query matrices; per batch assigns vectors to their nearest-centroid
    Voronoi cell and scores each query ONLY against vectors in that
    query's probed cells (true IVF semantics — a vector outside q's
    probe list is invisible to q even if another query probes it)."""

    def __init__(self, cents_ref, queries_ref, probe_cells_ref, k: int,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        import ray
        self.cents = _normalize(np.asarray(ray.get(cents_ref),
                                           dtype=np.float64))
        self.queries = _normalize(np.asarray(ray.get(queries_ref),
                                             dtype=np.float64))
        self.probe_cells = ray.get(probe_cells_ref)  # (Q, nprobe) int
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = vecs_from_arrow(batch.column(self.vec_col), np.float64)
        ids = np.asarray(batch.column(self.id_col).to_pylist())
        unit = _normalize(vecs)
        # Voronoi assignment; ties break to the LOWEST cell id (argmax
        # returns the first max) — mirrored in the SQL oracle
        assign = (unit @ self.cents.T).argmax(axis=1)
        sims = unit @ self.queries.T                       # (batch, Q)
        q_ids: list[int] = []
        v_ids: list = []
        scores: list[float] = []
        for q in range(self.queries.shape[0]):
            mask = np.isin(assign, self.probe_cells[q])
            if not mask.any():
                continue
            col = sims[mask, q]
            mids = ids[mask]
            top = min(self.k, len(col))
            idx = np.argpartition(-col, top - 1)[:top]
            q_ids.extend([q] * top)
            v_ids.extend(mids[idx].tolist())
            scores.extend(col[idx].tolist())
        return pa.table({
            "query_id": pa.array(q_ids, pa.int32()),
            self.id_col: pa.array(v_ids),
            "cosine": pa.array(scores, pa.float64()),
        })


def ivf_topk_seeded(ds, queries: np.ndarray, centroids: np.ndarray,
                    k: int = 10, nprobe: int = 2,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    concurrency=(1, 4)):
    """Deterministic IVF ANN: coarse quantizer = Voronoi cells of the
    given seed ``centroids`` (e.g. the C lowest-id vectors), queries
    probe only their ``nprobe`` nearest cells, exact cosine top-k within
    the probed cells.

    Genuinely approximate when ``nprobe < len(centroids)`` (a true
    neighbor in an unprobed cell is missed), yet fully deterministic and
    SQL-expressible — the driver value-checks it against a DuckDB oracle
    computing the identical cell structure. K-means-quality centroids
    (``ivf_topk``) trade that checkability for better cell balance.
    """
    import ray

    cents = _normalize(np.asarray(centroids, dtype=np.float64))
    q = _normalize(np.asarray(queries, dtype=np.float64))
    # per-query probe list: nprobe most-similar cells, ties to lowest id
    order = np.argsort(-(q @ cents.T), axis=1, kind="stable")
    probe_cells = order[:, :nprobe]
    cents_ref = ray.put(cents)
    q_ref = ray.put(q)
    probe_ref = ray.put(probe_cells)

    partial = ds.map_batches(
        SeededIVFScorer,
        fn_constructor_kwargs=dict(cents_ref=cents_ref, queries_ref=q_ref,
                                   probe_cells_ref=probe_ref, k=k,
                                   vec_col=vec_col, id_col=id_col),
        batch_format="pyarrow", concurrency=concurrency)

    def global_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.nlargest(k, "cosine")

    return partial.groupby("query_id").map_groups(global_topk,
                                                  batch_format="pandas")


def fit_centroids(sample: np.ndarray, num_centroids: int, iters: int = 10,
                  seed: int = 11) -> np.ndarray:
    """Small exact k-means on a driver-side sample (IVF coarse quantizer).

    The sample is small by construction (ds.random_sample upstream);
    the full dataset never materializes on the driver."""
    rng = np.random.RandomState(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float32))
    idx = rng.choice(len(sample), size=min(num_centroids, len(sample)),
                     replace=False)
    cents = sample[idx].copy()
    for _ in range(iters):
        sims = sample @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
    return cents


def ivf_topk(ds, queries: np.ndarray, k: int = 10, num_centroids: int = 16,
             nprobe: int = 4, vec_col: str = "embedding",
             id_col: str = "vec_id", sample_fraction: float = 0.1,
             seed: int = 11, concurrency=(1, 4)):
    """IVF-style ANN: assign vectors to coarse cells, probe top cells.

    Approximate (recall < 1 when a neighbor lands in an unprobed cell)
    — that's the documented tradeoff vs ``brute_force_topk``.
    """
    import ray

    # bounded driver-side training sample: random_sample alone scales
    # with the corpus; the limit() caps what reaches the driver
    max_train = max(256, 2048 * num_centroids)
    sample = ds.random_sample(sample_fraction, seed=seed) \
        .select_columns([vec_col]).limit(max_train).to_pandas()
    cents = fit_centroids(np.array(sample[vec_col].tolist()),
                          num_centroids, seed=seed)
    cents_ref = ray.put(cents)
    q = _normalize(np.asarray(queries, dtype=np.float32))
    probe_cells = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]
    probed = set(probe_cells.ravel().tolist())
    probed_ref = ray.put(np.array(sorted(probed), dtype=np.int64))

    class CellFilter:
        def __init__(self):
            self.cents = ray.get(cents_ref)
            self.probed = set(ray.get(probed_ref).tolist())

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _normalize(vecs_from_arrow(batch.column(vec_col),
                                       dtype=np.float32))
            assign = (vecs @ self.cents.T).argmax(axis=1)
            mask = np.isin(assign, list(self.probed))
            return batch.filter(pa.array(mask))

    filtered = ds.map_batches(CellFilter, batch_format="pyarrow",
                              concurrency=concurrency)
    return brute_force_topk(filtered, queries, k=k, vec_col=vec_col,
                            id_col=id_col, concurrency=concurrency)


class CentroidAssigner:
    """Nearest-centroid (cosine) assignment — the map step of k-means /
    cluster-balanced corpus curation. Centroids broadcast once via
    ``ray.put`` (fetched per actor in __init__, zero-copy); per batch
    one matmul + argmax. Ties break to the LOWEST centroid index
    (numpy argmax first-max == the oracle's ORDER BY sim DESC, cid ASC)."""

    def __init__(self, cents_ref, vec_col: str = "embedding",
                 id_col: str = "vec_id"):
        import ray
        self.cents = _normalize(
            np.asarray(ray.get(cents_ref), dtype=np.float64))
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(
            vecs_from_arrow(batch.column(self.vec_col), np.float64))
        assign = (vecs @ self.cents.T).argmax(axis=1)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "cluster_id": pa.array(assign.astype(np.int32), pa.int32()),
        })


def kmeans_train(ds, k: int = 8, iters: int = 5,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 init: np.ndarray | None = None):
    """Distributed Lloyd's k-means over the FULL dataset (euclidean).

    Per iteration: centroids broadcast via ``ray.put``; each batch does
    ONE distance matmul + argmin and collapses to k partial
    (sum-vector, count, inertia) rows; the driver folds k×d numbers per
    batch — never a vector table. Empty clusters keep their previous
    centroid. Default init = the first ``k`` vectors the streaming
    scan yields (``ds.limit(k)`` — pure truncation, no shuffle); pass
    ``init`` for deterministic-by-id seeding (the queries use a
    bounded ORDER BY vec_id LIMIT k prep).

    No SQL oracle (iterative algorithm — driver records rows-only for
    the query built on top); correctness is pinned by pytest: monotone
    non-increasing inertia and exact recovery of separated blobs.

    Returns ``(centroids ndarray (k, d), inertia list[float])``.
    """
    import ray

    if init is None:
        head = ds.limit(k).to_pandas()
        init = np.array(head[vec_col].tolist(), dtype=np.float64)
    centroids = np.asarray(init, dtype=np.float64).copy()
    if centroids.shape[0] != k:
        raise ValueError(f"init has {centroids.shape[0]} rows, want {k}")
    d = centroids.shape[1]
    inertia_per_iter: list[float] = []

    for _ in range(iters):
        cents_ref = ray.put(centroids)

        def partial(batch: pa.Table, _ref=cents_ref) -> pa.Table:
            cents = ray.get(_ref)
            vecs = vecs_from_arrow(batch.column(vec_col))
            # ||v - c||² = ||v||² - 2 v·c + ||c||²; argmin over c
            d2 = (-2.0 * vecs @ cents.T
                  + (cents * cents).sum(axis=1)[None, :])
            assign = d2.argmin(axis=1)
            best = d2[np.arange(len(vecs)), assign] \
                + (vecs * vecs).sum(axis=1)
            sums = np.zeros((k, d), np.float64)
            np.add.at(sums, assign, vecs)
            counts = np.bincount(assign, minlength=k).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.arange(k), pa.int64()),
                "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                "n": pa.array(counts, pa.int64()),
                "inertia": pa.array(
                    np.bincount(assign, weights=best, minlength=k),
                    pa.float64()),
            })

        sums = np.zeros((k, d), np.float64)
        counts = np.zeros(k, np.int64)
        inertia = 0.0
        for t in ds.map_batches(partial, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            # one block may hold SEVERAL k-row partial groups, so the
            # cluster ids repeat — np.add.at accumulates duplicates
            # (fancy-index += silently keeps only the last one)
            cl = t.column("cluster").to_numpy()
            np.add.at(sums, cl, np.array(t.column("vsum").to_pylist(),
                                         dtype=np.float64))
            np.add.at(counts, cl, t.column("n").to_numpy())
            inertia += float(
                t.column("inertia").to_numpy(zero_copy_only=False)
                .sum())
        inertia_per_iter.append(inertia)
        nonempty = counts > 0
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]

    return centroids, inertia_per_iter


def pca_project(ds, k: int = 4, vec_col: str = "embedding",
                id_col: str = "vec_id"):
    """Distributed PCA projection (dimensionality reduction before
    ANN/clustering): ONE streaming pass folds per-batch ``(n, Σx,
    XᵀX)`` partials — d and d×d numbers per batch, never vectors — the
    driver eigendecomposes the d×d covariance (trivial for embedding
    dims), and a second pass projects every vector against the
    broadcast top-``k`` components.

    Deterministic: components order by descending eigenvalue and each
    flips so its largest-|coefficient| entry is positive (eigenvector
    sign is otherwise arbitrary). Iterative-free but
    non-SQL-expressible (eigendecomposition) → rows-only driver check;
    pinned by pytest against numpy PCA of the whole table.

    Returns ``(vec_id, proj: list<double>[k])`` and the fitted
    ``(mean, components)`` as the second tuple element.
    """
    import ray

    n_tot = 0
    s = None
    ss = None
    for t in ds.map_batches(
            lambda b: _pca_partial(b, vec_col),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        for i in range(t.num_rows):
            n_tot += t.column("n")[i].as_py()
            sv = np.array(t.column("s")[i].as_py())
            ssv = np.array(t.column("ss")[i].as_py())
            d = len(sv)
            s = sv if s is None else s + sv
            ss = ssv.reshape(d, d) if ss is None \
                else ss + ssv.reshape(d, d)
    if n_tot < 2:
        raise ValueError("PCA needs at least 2 vectors")
    mean = s / n_tot
    cov = (ss - n_tot * np.outer(mean, mean)) / (n_tot - 1)
    evals, evecs = np.linalg.eigh(cov)      # ascending
    comps = evecs[:, ::-1][:, :k].T          # (k, d) desc eigenvalue
    flip = comps[np.arange(k),
                 np.abs(comps).argmax(axis=1)] < 0
    comps = np.where(flip[:, None], -comps, comps)
    fit_ref = ray.put((mean, comps))

    def project(batch: pa.Table) -> pa.Table:
        m, w = ray.get(fit_ref)
        vecs = vecs_from_arrow(batch.column(vec_col))
        proj = (vecs - m) @ w.T
        return pa.table({
            id_col: batch.column(id_col).cast(pa.int64()),
            "proj": pa.array(list(proj), pa.list_(pa.float64())),
        })

    return ds.map_batches(project, batch_format="pyarrow"), \
        (mean, comps)


def _pca_partial(batch: pa.Table, vec_col: str) -> pa.Table:
    vecs = vecs_from_arrow(batch.column(vec_col))
    return pa.table({
        "n": pa.array([len(vecs)], pa.int64()),
        "s": pa.array([vecs.sum(axis=0)], pa.list_(pa.float64())),
        "ss": pa.array([(vecs.T @ vecs).ravel()],
                       pa.list_(pa.float64())),
    })


def centroid_assign(ds, centroids: np.ndarray, vec_col: str = "embedding",
                    id_col: str = "vec_id", concurrency=(1, 4)):
    """Assign every vector to its nearest centroid by cosine — a
    narrow map (no shuffle): centroids ride the object store once,
    output is (id, cluster_id)."""
    import ray
    cents_ref = ray.put(np.asarray(centroids, dtype=np.float64))
    return ds.map_batches(
        CentroidAssigner, fn_constructor_kwargs=dict(
            cents_ref=cents_ref, vec_col=vec_col, id_col=id_col),
        batch_format="pyarrow", concurrency=concurrency)


class _MeanStepPartials:
    """Per-batch kernel for :func:`kmeans_mean_step`: cosine-assign
    (same tie rule as CentroidAssigner — argmax first-max == ORDER BY
    sim DESC, cid ASC), floor each coordinate to int micros, and emit
    per-(cluster, dim) PARTIAL sums + counts — k×d tiny rows per
    batch, the only thing that rides the shuffle."""

    def __init__(self, cents_ref, vec_col: str, id_col: str):
        import ray
        cents = np.asarray(ray.get(cents_ref), dtype=np.float64)
        self.cents_n = _normalize(cents)
        self.k = cents.shape[0]
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = vecs_from_arrow(batch.column(self.vec_col), np.float64)
        assign = (_normalize(vecs) @ self.cents_n.T).argmax(axis=1)
        micros = np.floor(vecs * 1_000_000.0).astype(np.int64)
        d = micros.shape[1]
        sums = np.zeros((self.k, d), np.int64)
        np.add.at(sums, assign, micros)      # duplicate cluster ids OK
        cnt = np.bincount(assign, minlength=self.k).astype(np.int64)
        nz = np.flatnonzero(cnt)             # skip empty clusters
        return pa.table({
            "cluster_id": pa.array(np.repeat(nz, d).astype(np.int32),
                                   pa.int32()),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    len(nz)), pa.int64()),
            "sum_micros": pa.array(sums[nz].ravel(), pa.int64()),
            "n": pa.array(np.repeat(cnt[nz], d), pa.int64()),
        })


def kmeans_mean_step(ds, centroids: np.ndarray,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id", concurrency=(1, 4)):
    """ONE Lloyd update step in EXACT integer arithmetic — the
    value-checked oracle row for the iterative k-means family
    (VERDICT r3 item 3): assign every vector to its nearest fixed
    centroid (cosine, deterministic ties), then the new centroid is
    the per-dimension mean of floor(coord × 10^6) micros.

    Shape: centroids broadcast once via ``ray.put``; per-batch matmul
    + ``np.add.at`` partials (k×d rows); ONE native-Sum groupby on
    (cluster, dim); a pure map divides. Division TRUNCATES toward
    zero (``s // n`` per DuckDB's integer ``//`` semantics, which
    truncate — numpy's ``//`` floors, so negatives are handled
    explicitly). Returns ``(cluster_id, dim 1-based, mean_micros,
    n)`` — empty clusters are absent, exactly as the SQL GROUP BY.
    """
    import ray
    from ray.data.aggregate import Sum

    cents_ref = ray.put(np.asarray(centroids, dtype=np.float64))
    partials = ds.map_batches(
        _MeanStepPartials, fn_constructor_kwargs=dict(
            cents_ref=cents_ref, vec_col=vec_col, id_col=id_col),
        batch_format="pyarrow", concurrency=concurrency)
    folded = partials.groupby(["cluster_id", "dim"]).aggregate(
        Sum("sum_micros", alias_name="s"), Sum("n", alias_name="n"))

    def mean(batch: pa.Table) -> pa.Table:
        s = batch.column("s").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = batch.column("n").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        trunc = np.sign(s) * (np.abs(s) // n)   # trunc-toward-zero
        return pa.table({
            "cluster_id": batch.column("cluster_id").cast(pa.int32()),
            "dim": batch.column("dim").cast(pa.int64()),
            "mean_micros": pa.array(trunc.astype(np.int64), pa.int64()),
            "n": pa.array(n, pa.int64()),
        })

    return folded.map_batches(mean, batch_format="pyarrow")


class _QuantizedProjector:
    """Per-batch kernel for :func:`quantized_project`: both the
    vectors and the broadcast component matrix quantize to int
    ``floor(x * scale)`` (the int8-style quantized-matmul practice),
    so the projection is an INTEGER matmul — exact, order-free,
    reproducible bit-for-bit by a SQL oracle."""

    def __init__(self, comps_ref, scale: int, vec_col: str,
                 id_col: str):
        import ray
        comps = np.asarray(ray.get(comps_ref), dtype=np.float64)
        self.cq = np.floor(comps * scale).astype(np.int64)   # (k, d)
        self.scale = scale
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = vecs_from_arrow(batch.column(self.vec_col), np.float64)
        vq = np.floor(vecs * self.scale).astype(np.int64)
        proj = vq @ self.cq.T                                # (n, k)
        n, k = proj.shape
        ids = batch.column(self.id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            self.id_col: pa.array(np.repeat(ids, k), pa.int64()),
            "component": pa.array(
                np.tile(np.arange(k, dtype=np.int64), n), pa.int64()),
            "proj_q": pa.array(proj.ravel(), pa.int64()),
        })


def quantized_project(ds, components: np.ndarray, *, scale: int = 1000,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id", concurrency=(1, 4)):
    """Projection onto FIXED components in exact integer arithmetic
    (the value-checked companion to the iterative ``pca_project``):
    ``proj_q[i,j] = Σ_d floor(v_d·scale) · floor(c_jd·scale)`` — one
    broadcast (``ray.put``) + one int64 matmul per batch, no shuffle.
    Returns ``(id_col, component, proj_q)`` long-form rows."""
    import ray
    comps_ref = ray.put(np.asarray(components, dtype=np.float64))
    return ds.map_batches(
        _QuantizedProjector, fn_constructor_kwargs=dict(
            comps_ref=comps_ref, scale=scale, vec_col=vec_col,
            id_col=id_col),
        batch_format="pyarrow", concurrency=concurrency)


def label_centroids(ds, *, vec_col: str = "embedding",
                    key_col: str = "label"):
    """Per-group centroid SUMS over an embedding column — the
    embedding-aggregation primitive (per-source/cluster mean vectors
    for mixture balancing or cluster summaries). Exact at any scale:
    every element is quantized to integer micros FIRST
    (``trunc(float64(x) * 1e6)`` — a pure function of the value, no
    round-half ties), so the per-(group, dim) int64 sums are
    independent of accumulation order and the DuckDB oracle matches
    bit for bit. The mean is ``sum_micros / n_vecs`` downstream —
    kept as (sum, n) so the exact-integer contract survives.

    Shuffle inventory: per-batch numpy ``np.add.at`` partials collapse
    each batch to |batch labels| x d rows; ONE groupby over
    (label, dim) — bounded by |labels| x d, never corpus-scale.
    Returns (key_col, dim, sum_micros, n_vecs)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        vecs = np.asarray(
            batch.column(vec_col).to_pylist(), dtype=np.float64)
        labels = np.asarray(batch.column(key_col).to_pylist(),
                            dtype=np.int64)
        n, d = vecs.shape
        micros = np.trunc(vecs * 1_000_000.0).astype(np.int64)
        codes, uniq = pd.factorize(labels)
        sums = np.zeros((len(uniq), d), dtype=np.int64)
        np.add.at(sums, codes, micros)
        counts = np.bincount(codes, minlength=len(uniq)).astype(
            np.int64)
        return pa.table({
            key_col: pa.array(np.repeat(uniq, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                    len(uniq)), pa.int64()),
            "partial_sum": pa.array(sums.ravel(), pa.int64()),
            "partial_n": pa.array(np.repeat(counts, d), pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([key_col, "dim"])
            .aggregate(Sum("partial_sum", alias_name="sum_micros"),
                       Sum("partial_n", alias_name="n_vecs")))


def quantize_int8(ds, *, vec_col: str = "embedding",
                  id_col: str = "vec_id"):
    """Per-row symmetric int8 quantization of an embedding column —
    the storage/bandwidth step every large ANN index applies before
    vectors land on disk (scale = 127 / max|x|, q_i = trunc(x_i *
    scale)). Pure per-batch numpy over the zero-copy matrix view
    (:func:`vecs_from_arrow`) — ZERO shuffles, no state.

    Exactness contract: everything runs in float64 (float32 inputs
    upcast exactly), TRUNC not ROUND (a pure function of the value —
    no round-half ties), so the DuckDB oracle (``CAST(... AS
    DOUBLE[])`` + ``list_transform`` with the same expression nesting)
    reproduces every quantized value bit for bit. All-zero rows get
    scale 0 (all-zero codes) rather than a divide-by-zero.

    Returns (id_col, l1_q, nnz_q): the L1 norm and nonzero count of
    each row's int8 codes — integer summaries that pin every element
    of the quantized vector family without shipping d columns."""

    def quant(batch: pa.Table) -> pa.Table:
        m = vecs_from_arrow(batch.column(vec_col), np.float64)
        amax = np.abs(m).max(axis=1) if m.size else np.zeros(len(m))
        safe = np.where(amax > 0, amax, 1.0)
        scale = np.where(amax > 0, 127.0 / safe, 0.0)
        q = np.trunc(m * scale[:, None]).astype(np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            "l1_q": pa.array(np.abs(q).sum(axis=1), pa.int64()),
            "nnz_q": pa.array((q != 0).sum(axis=1).astype(np.int64),
                              pa.int64()),
        })

    return ds.map_batches(quant, batch_format="pyarrow")


class SelfKnnScorer:
    """Actor for :func:`knn_graph`: holds the broadcast reference
    matrix (ids + unit-normalized float64 vectors, fetched once per
    actor) and emits each batch row's exact cosine top-k EXCLUDING
    itself — ties break to the LOWEST neighbor id (mirrored by the
    SQL oracle's ``ORDER BY sim DESC, vec_id``)."""

    def __init__(self, ids_ref, mat_ref, k: int,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        import ray
        self.ref_ids = np.asarray(ray.get(ids_ref), np.int64)
        self.mat = _normalize(np.asarray(ray.get(mat_ref),
                                         np.float64))
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = vecs_from_arrow(batch.column(self.vec_col), np.float64)
        ids = np.asarray(batch.column(self.id_col).to_pylist(),
                         np.int64)
        unit = _normalize(vecs)
        sims = unit @ self.mat.T                     # (b, N)
        n_ref = self.mat.shape[0]
        k = min(self.k, max(n_ref - 1, 0))
        src, nbr, rank = [], [], []
        for i in range(len(ids)):
            row = sims[i].copy()
            row[self.ref_ids == ids[i]] = -np.inf    # exclude self
            m = min(k + 8, n_ref)                    # tie slack
            cand = np.argpartition(-row, m - 1)[:m]
            order = np.lexsort((self.ref_ids[cand], -row[cand]))
            top = cand[order][:k]
            src.append(np.full(len(top), ids[i], np.int64))
            nbr.append(self.ref_ids[top])
            rank.append(np.arange(1, len(top) + 1, dtype=np.int64))
        if not src:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64())})
        return pa.table({
            "vec_id": pa.array(np.concatenate(src), pa.int64()),
            "neighbor_id": pa.array(np.concatenate(nbr), pa.int64()),
            "rank": pa.array(np.concatenate(rank), pa.int64())})


def knn_graph(ds, ref_ids: np.ndarray, ref_mat: np.ndarray,
              k: int = 5, vec_col: str = "embedding",
              id_col: str = "vec_id", concurrency=(1, 4)):
    """Exact cosine k-nearest-neighbor GRAPH of a corpus against a
    reference matrix (usually itself): the graph-based curation /
    label-propagation primitive. The reference rides ``ray.put`` ONCE
    (read per actor in ``__init__``, never reshipped per batch); each
    batch is one float64 matmul.

    Scale contract (per the custom-operator rule): the broadcast
    reference must fit a worker heap — the exact baseline up to ~10^6
    vectors (10^6 x 64 float64 = 0.5 GB). Beyond that, block with
    :func:`ivf_topk` cells or the LSH buckets of
    ``dedup.embedding_neardup`` and run this kernel per cell.
    Returns (vec_id, neighbor_id, rank), rank 1..k by cosine DESC,
    neighbor id ASC on ties, self excluded."""
    import ray

    ids_ref = ray.put(np.asarray(ref_ids, np.int64))
    mat_ref = ray.put(np.asarray(ref_mat, np.float64))
    return ds.map_batches(
        SelfKnnScorer,
        fn_constructor_kwargs=dict(ids_ref=ids_ref, mat_ref=mat_ref,
                                   k=k, vec_col=vec_col,
                                   id_col=id_col),
        batch_format="pyarrow", concurrency=concurrency)
