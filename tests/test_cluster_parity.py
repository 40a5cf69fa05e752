"""Cross-implementation parity for the DPC-KNN clustering stack vs the
ACTUAL reference torch code (/root/reference/ChatUniVi/model/cluster.py,
arch.py:110-217 `project`).

The reference breaks density ties with torch.rand()*1e-6; both sides get
IDENTICAL injected tie-break noise (a queue of deterministic vectors that
match our index-scaled epsilon, cluster.py:142-144 vs models/cluster.py:63),
so center sets, assignments, merged features, and the full image/video
projection outputs must match exactly (fp32 allclose).

The video check is the important one: the reference gathers each event's
member frames and clusters the SUBSET (arch.py:163-208); ours clusters the
full fixed-capacity (T*level) grid with a membership mask. This test is the
machine proof that the masked static reformulation computes the same thing.
"""

import importlib.util
import sys
from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_CLUSTER = "/root/reference/ChatUniVi/model/cluster.py"

import jax.numpy as jnp  # noqa: E402

from open_pandora_tpu.models.cluster import (cluster_dpc_knn, ctm_down,  # noqa: E402
                                             merge_tokens,
                                             project_image_tokens,
                                             project_video_tokens)

pytestmark = [pytest.mark.refparity, pytest.mark.slow]


def _load_ref():
    spec = importlib.util.spec_from_file_location("ref_cluster", REF_CLUSTER)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_cluster"] = mod
    spec.loader.exec_module(mod)
    return mod


REF = _load_ref()


class _NoiseQueue:
    """Replaces torch.rand inside the reference cluster code with a queue of
    prepared per-call tie-break vectors (each expanded over the batch dim),
    so both implementations see identical density noise."""

    def __init__(self):
        self.q = []

    def push(self, vec):
        self.q.append(np.asarray(vec, np.float32))

    def __call__(self, size, **kw):
        assert self.q, "reference made more rand() calls than expected"
        vec = self.q.pop(0)
        size = tuple(size)
        assert vec.shape[0] == size[-1], (vec.shape, size)
        t = torch.from_numpy(vec)
        if kw.get("dtype") is not None:
            t = t.to(kw["dtype"])
        return t.expand(size).clone()


@pytest.fixture
def noise():
    nq = _NoiseQueue()
    orig = torch.rand
    torch.rand = nq
    yield nq
    torch.rand = orig
    assert not nq.q, f"{len(nq.q)} prepared noise vectors unused"


def _fresh_dict(x):
    """arch.py:114-121 token dict construction."""
    return {"x": x, "token_num": x.size(1),
            "idx_token": torch.arange(x.size(1))[None, :].repeat(x.size(0), 1),
            "agg_weight": x.new_ones(x.size(0), x.size(1), 1),
            "mask": None}


def _ref_ctm(x, cluster_num, k):
    """One reference CTM stage (cluster.py:226-257 with TCBlock identity):
    returns merged x."""
    ctm = REF.CTM(sample_ratio=cluster_num, embed_dim=x.shape[-1],
                  dim_out=x.shape[-1], k=k)
    down, _ = ctm(_fresh_dict(x))
    return down


def test_dpc_knn_centers_and_assignment_parity(noise):
    rs = np.random.RandomState(0)
    B, N, C, K = 2, 24, 8, 6
    x = rs.randn(B, N, C).astype(np.float32)
    noise.push(np.arange(N, dtype=np.float32))
    with torch.no_grad():
        idx_ref, _ = REF.cluster_dpc_knn(_fresh_dict(torch.from_numpy(x)),
                                         K, k=5)
    idx, centers = cluster_dpc_knn(jnp.asarray(x), K, k=5)
    np.testing.assert_array_equal(np.asarray(idx), idx_ref.numpy())
    # every center self-assigns to its own label
    for b in range(B):
        np.testing.assert_array_equal(
            np.asarray(idx)[b][np.asarray(centers)[b]], np.arange(K))


def test_merge_tokens_parity(noise):
    rs = np.random.RandomState(1)
    B, N, C, K = 2, 24, 8, 6
    x = rs.randn(B, N, C).astype(np.float32)
    noise.push(np.arange(N, dtype=np.float32))
    with torch.no_grad():
        td = _fresh_dict(torch.from_numpy(x))
        idx_ref, _ = REF.cluster_dpc_knn(td, K, k=5)
        out_ref = REF.merge_tokens(td, idx_ref, K,
                                   torch.ones(B, N, 1))["x"].numpy()
    idx, _ = cluster_dpc_knn(jnp.asarray(x), K, k=5)
    out = merge_tokens(jnp.asarray(x), idx, K)
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-5, rtol=1e-5)


def test_project_image_parity(noise):
    """Image branch: 3 cascaded CTMs (arch.py:112-132) vs
    project_image_tokens."""
    rs = np.random.RandomState(2)
    P, C = 16, 8
    rates, ks = (8, 4, 2), (5, 3, 3)
    x = rs.randn(2, P, C).astype(np.float32)

    n = P
    for r in rates:
        noise.push(np.arange(n, dtype=np.float32))
        n = r
    with torch.no_grad():
        outs = []
        t = torch.from_numpy(x)
        for r, k in zip(rates, ks):
            t = _ref_ctm(t, r, k)["x"]
            outs.append(t)
        out_ref = torch.cat(outs, dim=1).numpy()

    out = project_image_tokens(jnp.asarray(x), rates=rates)
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-5, rtol=1e-5)


def _ref_video_project(feats, rates, ks, E):
    """Faithful transcription of the reference video branch
    (arch.py:133-208): temporal CTM over per-frame means -> OrderedDict
    event grouping -> per-frame spatial cascade -> per-event gather +
    re-cluster of each level, events in first-occurrence order."""
    T = feats.shape[0]
    cls = feats.mean(dim=1).unsqueeze(0)                  # (1, T, C)
    ctm3 = REF.CTM(sample_ratio=E, embed_dim=feats.shape[-1],
                   dim_out=feats.shape[-1], k=5)
    down, _ = ctm3(_fresh_dict(cls))
    events = OrderedDict()
    for fid, ev in enumerate(down["idx_token"][0].tolist()):
        events.setdefault(ev, []).append(fid)

    level = []
    t = feats                                             # (T, P, C) batched
    for r, k in zip(rates, ks):
        t = _ref_ctm(t, r, k)["x"]
        level.append(t)                                   # (T, r, C)

    outs = []
    for key in events:
        for lv, (lf, r, k) in enumerate(zip(level, rates, ks)):
            cur = torch.cat([lf[i] for i in events[key]], dim=0).unsqueeze(0)
            outs.append(_ref_ctm(cur, r, k)["x"])
    return torch.cat(outs, dim=1).numpy(), events


def test_project_video_parity(noise):
    """Video branch: event grouping + per-event subset clustering
    (arch.py:133-208) vs the masked fixed-capacity reformulation."""
    rs = np.random.RandomState(3)
    T, P, C = 5, 16, 8
    rates, ks = (8, 4, 2), (5, 3, 3)
    temporal_rate = 0.5
    E = int(np.ceil(T * temporal_rate))
    feats = rs.randn(T, P, C).astype(np.float32)

    # noise schedule must mirror the reference call order exactly:
    # 1 temporal call, 3 per-frame cascade calls, then 3 calls per event
    # whose noise vectors are the member tokens' positions in OUR fixed
    # (T * level_rate) grid — that is what makes the tie-breaks identical.
    noise.push(np.arange(T, dtype=np.float32))
    n = P
    for r in rates:
        noise.push(np.arange(n, dtype=np.float32))
        n = r

    # precompute the event grouping (same temporal noise) to build the
    # per-event noise vectors; then reset the queue for the real run
    with torch.no_grad():
        saved = list(noise.q)
        cls = torch.from_numpy(feats).mean(dim=1).unsqueeze(0)
        noise.q = [saved[0]]
        ctm3 = REF.CTM(sample_ratio=E, embed_dim=C, dim_out=C, k=5)
        down, _ = ctm3(_fresh_dict(cls))
        events = OrderedDict()
        for fid, ev in enumerate(down["idx_token"][0].tolist()):
            events.setdefault(ev, []).append(fid)
        noise.q = saved

    for key in events:
        members = np.asarray(events[key])
        for r in rates:
            grid_pos = (members[:, None] * r
                        + np.arange(r)[None, :]).reshape(-1)
            noise.push(grid_pos.astype(np.float32))

    with torch.no_grad():
        out_ref, ev_ref = _ref_video_project(torch.from_numpy(feats),
                                             rates, ks, E)

    out = project_video_tokens(jnp.asarray(feats), rates=rates,
                               temporal_rate=temporal_rate)
    assert out.shape == (1, sum(rates) * E, C)
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-5,
                               rtol=1e-5)
