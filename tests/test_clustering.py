"""stages/clustering: integer k-means + SemDeDup flags on hand-built
inputs — blob recovery, exact floor-division centroid updates,
empty-cluster drop, threshold boundary and the documented
cluster-local approximation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ferenda_ray.stages import clustering


def _qds(mat, keys=None):
    mat = np.asarray(mat, dtype=np.int64)
    keys = np.arange(len(mat)) if keys is None else np.asarray(keys)
    t = pa.table({
        "vec_id": pa.array(keys, pa.int64()),
        "qv": clustering._qv_column(mat),
    })
    return ray.data.from_arrow(t)


def test_quantize_floor_semantics(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({
        "vec_id": [0, 1],
        "embedding": [[0.1234, -0.5678], [0.9999, -0.0001]],
    }))
    out = clustering.quantize_vectors(ds).to_pandas().sort_values("vec_id")
    assert list(out["qv"].iloc[0]) == [123, -568]
    assert list(out["qv"].iloc[1]) == [999, -1]


def test_kmeans_recovers_blobs(ray_session):
    # two tight blobs; init keys 0 (blob A) and 1 (blob B)
    a = [[0, 0], [1, 0], [0, 1], [1, 1]]
    b = [[100, 100], [101, 100], [100, 101], [101, 101]]
    keys = [0, 2, 4, 6, 1, 3, 5, 7]  # interleave so init picks one of each
    qds = _qds(a + b, keys=keys).materialize()
    ids, cmat = clustering.kmeans_int(qds, k=2, iterations=2)
    assert list(ids) == [0, 1]
    # centroid = elementwise floor(sum/count): blob A sums (2,2)/4 → 0
    assert cmat[0].tolist() == [0, 0]
    assert cmat[1].tolist() == [100, 100]
    ads = clustering.assign_clusters(qds, ids, cmat).to_pandas()
    got = dict(zip(ads["vec_id"], ads["cluster"]))
    assert all(got[k] == 0 for k in (0, 2, 4, 6))
    assert all(got[k] == 1 for k in (1, 3, 5, 7))


def test_kmeans_negative_floor_division(ray_session):
    # sums (-3, 3) over 2 members → floor(-1.5)=-2, floor(1.5)=1
    qds = _qds([[-1, 1], [-2, 2], [50, 50]], keys=[0, 2, 1]).materialize()
    ids, cmat = clustering.kmeans_int(qds, k=2, iterations=1)
    assert cmat[0].tolist() == [-2, 1]


def test_kmeans_drops_empty_cluster(ray_session):
    # both init vectors sit in one blob; after one update the far blob
    # captures everything and one cluster must drop (k'=1... actually
    # both init centroids persist only if they keep members)
    qds = _qds([[0, 0], [0, 0], [0, 0], [0, 1]], keys=[0, 1, 2, 3])
    qds = qds.materialize()
    ids, cmat = clustering.kmeans_int(qds, k=2, iterations=1)
    # vec 1 ([0,0]) ties to cluster 0 (smaller id wins) → cluster 1
    # keeps no members except... assignment of [0,0] prefers c0; [0,1]
    # is equidistant from [0,0] and [0,0]? init c0=[0,0], c1=[0,0]:
    # every tie → c0, cluster 1 empties and is dropped
    assert list(ids) == [0]


def test_semdedup_flags_within_and_across_clusters(ray_session):
    # cluster 0: v0 and its near-clone v5 (cos≈1) → v5 removed;
    # v7 orthogonal-ish → kept. cluster 1: v1, plus v9 IDENTICAL to v0
    # but assigned to cluster 1 → kept (the documented cluster-local
    # approximation).
    rows = pd.DataFrame({
        "vec_id": [0, 5, 7, 1, 9],
        "cluster": [0, 0, 0, 1, 1],
        "qv": [[100, 0], [100, 1], [0, 100], [-100, -100], [100, 0]],
    })
    ds = ray.data.from_pandas(rows)
    out = clustering.semdedup_flags(ds).to_pandas()
    got = dict(zip(out["vec_id"], out["kept"]))
    assert got == {0: True, 5: False, 7: True, 1: True, 9: True}


def test_semdedup_threshold_boundary(ray_session):
    # cos(a,b) = 0.8 exactly: thr τ²=0.64 → removed at thr ≤ 0.64·den
    rows = pd.DataFrame({
        "vec_id": [0, 1],
        "cluster": [0, 0],
        "qv": [[3, 4], [4, 3]],  # dot=24, |a|²=|b|²=25 → cos=0.96
    })
    ds = ray.data.from_pandas(rows)
    # τ² = 0.9216 exactly (24²·10⁴ = 9216·25·25): boundary inclusive
    out = clustering.semdedup_flags(ds, thr_num=9216,
                                    thr_den=10000).to_pandas()
    assert dict(zip(out["vec_id"], out["kept"])) == {0: True, 1: False}
    out = clustering.semdedup_flags(ds, thr_num=9217,
                                    thr_den=10000).to_pandas()
    assert dict(zip(out["vec_id"], out["kept"])) == {0: True, 1: True}
