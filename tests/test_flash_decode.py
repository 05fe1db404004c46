"""Pallas flash-decode kernel vs the portable XLA attention path (SURVEY.md
§4: "Pallas kernels vs jnp reference implementations"). Runs the kernel in
interpreter mode on CPU; on a real TPU the same comparisons exercise the
compiled kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from triforce_tpu.ops import attention
from triforce_tpu.ops.flash_decode import append_attention_pallas

BLOCK = 128  # small DMA block so tests cover multi-block trips


def _mk(hq, hkv, t, s, d, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    q = jax.random.normal(ks[0], (1, hq, t, d), jnp.float32)
    k = jax.random.normal(ks[1], (1, hkv, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (1, hkv, s, d), jnp.float32)
    kn = jax.random.normal(ks[3], (1, hkv, t, d), jnp.float32)
    vn = jax.random.normal(ks[4], (1, hkv, t, d), jnp.float32)
    return q, k, v, kn, vn


@pytest.mark.parametrize("hq,hkv,t,k_len", [
    (4, 4, 1, 300),     # MHA 1-token decode, partial last block
    (4, 2, 1, 512),     # GQA, exact block boundary
    (4, 2, 7, 413),     # gamma+1 verify shapes
    (2, 2, 3, 0),       # empty cache (first tokens)
])
def test_kernel_matches_xla(hq, hkv, t, k_len):
    s, d = 512, 32
    q, k, v, kn, vn = _mk(hq, hkv, t, s, d, seed=k_len + t)
    want = attention.append_attention(q, k, v, kn, vn,
                                      k_len=jnp.asarray(k_len))
    got = append_attention_pallas(q, k, v, kn, vn,
                                  k_len=jnp.asarray(k_len), block=BLOCK,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_kernel_tree_mask():
    s, d, t = 256, 32, 5
    q, k, v, kn, vn = _mk(4, 4, t, s, d, seed=9)
    mask = np.tril(np.ones((t, t), bool))
    mask[3, 1] = False  # arbitrary non-causal tree shape
    mask[4, 2] = False
    want = attention.append_attention(q, k, v, kn, vn,
                                      k_len=jnp.asarray(100),
                                      new_mask=jnp.asarray(mask))
    got = append_attention_pallas(q, k, v, kn, vn, k_len=jnp.asarray(100),
                                  new_mask=jnp.asarray(mask), block=BLOCK,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_kernel_ignores_stale_tail():
    """Slots at or beyond k_len must not contribute (rollback semantics)."""
    s, d, t = 256, 16, 1
    q, k, v, kn, vn = _mk(2, 2, t, s, d, seed=3)
    poisoned_k = k.at[:, :, 120:].set(1e4)
    poisoned_v = v.at[:, :, 120:].set(1e4)
    clean = append_attention_pallas(q, k, v, kn, vn,
                                    k_len=jnp.asarray(120), block=BLOCK,
                                    interpret=True)
    dirty = append_attention_pallas(q, poisoned_k, poisoned_v, kn, vn,
                                    k_len=jnp.asarray(120), block=BLOCK,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(clean), np.asarray(dirty))


def test_kernel_quantized_cache():
    """int8 cache path: kernel vs XLA dequant path."""
    from triforce_tpu.cache import quantize_tokens
    s, d, t = 512, 32, 3
    q, k, v, kn, vn = _mk(4, 4, t, s, d, seed=21)
    k8, ks = quantize_tokens(k)
    v8, vs = quantize_tokens(v)
    want = attention.append_attention(q, k8, v8, kn, vn,
                                      k_len=jnp.asarray(300),
                                      k_scale=ks, v_scale=vs)
    got = append_attention_pallas(q, k8, v8, kn, vn,
                                  k_len=jnp.asarray(300), block=BLOCK,
                                  interpret=True, k_scale=ks, v_scale=vs)
    # the kernel also quantizes q and p to run int8 MXU matmuls (the XLA
    # path dequantizes exactly), so tolerance is int8-rounding-sized
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2)


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("layer", [0, 1, 2])
def test_kernel_stacked_layer_matches_slab(quant, layer):
    """Zero-copy stacked-cache path: the kernel reading layer ``l`` of an
    [L,1,Hkv,S,D] stack must equal the plain kernel on that layer's slab
    (the layer coordinate rides a second scalar-prefetch arg into the
    BlockSpec index maps)."""
    from triforce_tpu.cache import quantize_tokens
    L, s, d, t = 3, 512, 32, 2
    hq = hkv = 4
    keys = jax.random.split(jax.random.PRNGKey(layer + 10 * quant), 5)
    q = jax.random.normal(keys[0], (1, hq, t, d), jnp.float32)
    kst = jax.random.normal(keys[1], (L, 1, hkv, s, d), jnp.float32)
    vst = jax.random.normal(keys[2], (L, 1, hkv, s, d), jnp.float32)
    kn = jax.random.normal(keys[3], (1, hkv, t, d), jnp.float32)
    vn = jax.random.normal(keys[4], (1, hkv, t, d), jnp.float32)
    kss = vss = None
    if quant:
        kst, kss = quantize_tokens(kst)
        vst, vss = quantize_tokens(vst)
    k_len = jnp.asarray(333)
    want = append_attention_pallas(
        q, kst[layer], vst[layer], kn, vn, k_len=k_len, block=BLOCK,
        interpret=True,
        k_scale=None if not quant else kss[layer],
        v_scale=None if not quant else vss[layer])
    got = append_attention_pallas(
        q, kst, vst, kn, vn, k_len=k_len, block=BLOCK, interpret=True,
        k_scale=kss, v_scale=vss, layer=jnp.asarray(layer))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_stacked_partials_match_slab():
    from triforce_tpu.ops.flash_decode import flash_decode_partials
    L, hkv, s, d, gt = 3, 2, 512, 32, 4
    keys = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(keys[0], (hkv, gt, d), jnp.float32)
    kst = jax.random.normal(keys[1], (L, hkv, s, d), jnp.float32)
    vst = jax.random.normal(keys[2], (L, hkv, s, d), jnp.float32)
    for layer in (0, 2):
        want = flash_decode_partials(q, kst[layer], vst[layer],
                                     jnp.asarray(400), block=BLOCK,
                                     interpret=True)
        got = flash_decode_partials(q, kst, vst, jnp.asarray(400),
                                    block=BLOCK, interpret=True,
                                    layer=jnp.asarray(layer))
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       atol=1e-6, rtol=1e-6)


def test_auto_stacked_fallback_matches_slab():
    """append_attention_auto with ``layer`` on the XLA fallback (CPU) must
    equal the slab call — the path every CPU test of the model forwards
    now exercises."""
    L, s, d, t = 3, 512, 32, 2
    hq, hkv = 4, 2
    keys = jax.random.split(jax.random.PRNGKey(7), 5)
    q = jax.random.normal(keys[0], (1, hq, t, d), jnp.float32)
    kst = jax.random.normal(keys[1], (L, 1, hkv, s, d), jnp.float32)
    vst = jax.random.normal(keys[2], (L, 1, hkv, s, d), jnp.float32)
    kn = jax.random.normal(keys[3], (1, hkv, t, d), jnp.float32)
    vn = jax.random.normal(keys[4], (1, hkv, t, d), jnp.float32)
    for layer in (0, 1, 2):
        want = attention.append_attention(q, kst[layer], vst[layer], kn, vn,
                                          k_len=jnp.asarray(200))
        got = attention.append_attention_auto(
            q, kst, vst, kn, vn, k_len=jnp.asarray(200),
            layer=jnp.asarray(layer))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6, rtol=1e-6)


def test_auto_stacked_under_vmap_matches_rows():
    """Batched speculation path: vmapped stacked call lowers through the
    stacked custom_vmap rule (slice layer -> row-batched kernel on TPU; on
    CPU the fallback) and must equal per-row slab attention."""
    B, L, s, d, t = 2, 3, 512, 32, 1
    hq = hkv = 2
    keys = jax.random.split(jax.random.PRNGKey(11), 5)
    q = jax.random.normal(keys[0], (B, 1, hq, t, d), jnp.float32)
    kst = jax.random.normal(keys[1], (B, L, 1, hkv, s, d), jnp.float32)
    vst = jax.random.normal(keys[2], (B, L, 1, hkv, s, d), jnp.float32)
    kn = jax.random.normal(keys[3], (B, 1, hkv, t, d), jnp.float32)
    vn = jax.random.normal(keys[4], (B, 1, hkv, t, d), jnp.float32)
    k_lens = jnp.asarray([300, 77])
    layer = jnp.asarray(1)

    def one(q, k, v, kn, vn, kl):
        return attention.append_attention_auto(q, k, v, kn, vn, k_len=kl,
                                               layer=layer)

    got = jax.vmap(one)(q, kst, vst, kn, vn, k_lens)
    for b in range(B):
        want = attention.append_attention(
            q[b], kst[b, 1], vst[b, 1], kn[b], vn[b], k_len=k_lens[b])
        np.testing.assert_allclose(np.asarray(got[b]), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("quant", [False, True])
def test_kernel_prefill_chunk_shapes(quant):
    """Flash-PREFILL: a whole chunk of queries (gt = T >> 64) against the
    committed prefix + causal self-block — the shape class the dispatch
    guard admits for prefill after round 2."""
    hq = hkv = 2
    t, s, d, k_len = 128, 512, 32, 293
    q, k, v, kn, vn = _mk(hq, hkv, t, s, d, seed=3)
    ks = vs = None
    if quant:
        def q8(x):
            sc = jnp.maximum(jnp.max(jnp.abs(x), axis=-1) / 127.0, 1e-8)
            codes = jnp.clip(jnp.round(x / sc[..., None]), -127, 127)
            return codes.astype(jnp.int8), sc
        k, ks = q8(k)
        v, vs = q8(v)
    want = attention.append_attention(
        q, k, v, kn, vn, k_len=jnp.asarray(k_len), k_scale=ks, v_scale=vs)
    got = append_attention_pallas(
        q, k, v, kn, vn, k_len=jnp.asarray(k_len), block=BLOCK,
        interpret=True, k_scale=ks, v_scale=vs)
    tol = 5e-2 if quant else 2e-5
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=tol, rtol=tol)


# ---------------------------------------------------------------------------
# Row-batched kernel (batched speculation path)
# ---------------------------------------------------------------------------

def _mk_batched(b, hq, hkv, t, s, d, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    q = jax.random.normal(ks[0], (b, hkv, (hq // hkv) * t, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, hkv, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, hkv, s, d), jnp.float32)
    kn = jax.random.normal(ks[3], (b, hkv, t, d), jnp.float32)
    vn = jax.random.normal(ks[4], (b, hkv, t, d), jnp.float32)
    return q, k, v, kn, vn


@pytest.mark.parametrize("t,k_lens", [
    (1, (300, 512, 0, 77)),     # decode rows at different live lengths
    (3, (511, 129, 256, 384)),  # verify-width rows
])
def test_batched_kernel_matches_per_row(t, k_lens):
    """flash_decode_append_batched == per-row flash_decode_append, each row
    bounded by its OWN live length (the per-row k_len state batched
    speculation carries)."""
    from triforce_tpu.ops.flash_decode import (flash_decode_append,
                                               flash_decode_append_batched)
    b, hkv, s, d = len(k_lens), 2, 512, 64
    q, k, v, kn, vn = _mk_batched(b, 2, hkv, t, s, d, seed=3)
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    nmask = cols <= rows
    klen = jnp.asarray(k_lens, jnp.int32)
    got = flash_decode_append_batched(
        q, k, v, kn, vn, klen, jnp.broadcast_to(nmask, (b, t, t)),
        block=BLOCK, interpret=True)
    for i in range(b):
        want = flash_decode_append(q[i], k[i], v[i], kn[i], vn[i],
                                   int(k_lens[i]), nmask, block=BLOCK,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)


def test_batched_kernel_matches_per_row_int8():
    from triforce_tpu.ops.flash_decode import (flash_decode_append,
                                               flash_decode_append_batched)
    b, hkv, s, d, t = 3, 2, 512, 64, 2
    k_lens = (300, 512, 128)
    q, k, v, kn, vn = _mk_batched(b, 2, hkv, t, s, d, seed=9)
    q = q.astype(jnp.bfloat16)
    kn, vn = kn.astype(jnp.bfloat16), vn.astype(jnp.bfloat16)
    ksc = jnp.maximum(jnp.max(jnp.abs(k), axis=-1) / 127.0, 1e-8)
    vsc = jnp.maximum(jnp.max(jnp.abs(v), axis=-1) / 127.0, 1e-8)
    k8 = jnp.clip(jnp.round(k / ksc[..., None]), -127, 127).astype(jnp.int8)
    v8 = jnp.clip(jnp.round(v / vsc[..., None]), -127, 127).astype(jnp.int8)
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    nmask = cols <= rows
    got = flash_decode_append_batched(
        q, k8, v8, kn, vn, jnp.asarray(k_lens, jnp.int32),
        jnp.broadcast_to(nmask, (b, t, t)), block=BLOCK, interpret=True,
        k_scale=ksc, v_scale=vsc)
    for i in range(b):
        want = flash_decode_append(q[i], k8[i], v8[i], kn[i], vn[i],
                                   int(k_lens[i]), nmask, block=BLOCK,
                                   interpret=True, k_scale=ksc[i],
                                   v_scale=vsc[i])
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)


def test_custom_vmap_rule_matches_unbatched():
    """The custom_vmap rule (vmapped B=1 attention -> row-batched kernel)
    produces the same values as per-row B=1 kernel calls. Runs the rule
    directly (interpret-mode kernels), since CPU dispatch never admits
    Pallas."""
    from triforce_tpu.ops import attention as A
    from triforce_tpu.ops import flash_decode as F
    import functools as ft

    # force interpret mode inside both kernels for the CPU run
    orig_b = F.flash_decode_append_batched
    orig_s = F.flash_decode_append

    b, hq, hkv, t, s, d = 3, 4, 2, 2, 512, 64
    qs, ks_, vs_, kns, vns = [], [], [], [], []
    for i in range(b):
        q, k, v, kn, vn = _mk(hq, hkv, t, s, d, seed=20 + i)
        qs.append(q); ks_.append(k); vs_.append(v)
        kns.append(kn); vns.append(vn)
    qB = jnp.stack(qs); kB = jnp.stack(ks_); vB = jnp.stack(vs_)
    knB = jnp.stack(kns); vnB = jnp.stack(vns)
    klB = jnp.asarray([300, 511, 128], jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    nmask = cols <= rows

    try:
        F.flash_decode_append_batched = ft.partial(orig_b, interpret=True)
        got, batched = A._cv_rule(
            False, b, [True] * 6 + [False],
            qB, kB, vB, knB, vnB, klB, nmask)
        assert batched is True
    finally:
        F.flash_decode_append_batched = orig_b
    for i in range(b):
        want = F.flash_decode_append(
            qB[i, 0].reshape(hkv, (hq // hkv) * t, d), kB[i, 0], vB[i, 0],
            knB[i, 0], vnB[i, 0], int(klB[i]),
            jnp.tile(nmask, (hq // hkv, 1)), block=F._pick_block(
                s, hkv, d, (hq // hkv) * t, 128), interpret=True)
        np.testing.assert_allclose(
            np.asarray(got[i, 0].reshape(hkv, (hq // hkv) * t, d)),
            np.asarray(want), atol=2e-5, rtol=2e-5)


def test_custom_vmap_wrapper_unbatched_path():
    """The _pallas_cv wrappers must behave exactly like a direct
    append_attention_pallas call when NOT vmapped (they are the TPU
    dispatch path now), including under jit. Runs interpret-mode kernels
    via monkeypatch since CPU dispatch never admits Pallas."""
    import functools as ft
    from triforce_tpu.ops import attention as A
    from triforce_tpu.ops import flash_decode as F

    q, k, v, kn, vn = _mk(4, 2, 2, 512, 64, seed=31)
    k_len = jnp.int32(300)
    rows = jax.lax.broadcasted_iota(jnp.int32, (2, 2), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (2, 2), 1)
    nmask = cols <= rows

    orig = F.append_attention_pallas
    try:
        F.append_attention_pallas = ft.partial(orig, interpret=True)
        got = jax.jit(A._pallas_cv)(q, k, v, kn, vn, k_len, nmask)
        got2 = A._pallas_cv(q, k, v, kn, vn, k_len, nmask)
    finally:
        F.append_attention_pallas = orig
    want = orig(q, k, v, kn, vn, k_len=k_len, new_mask=nmask,
                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("quant", [False, True])
def test_batched_kernel_stacked_layer_matches_slab(quant):
    """flash_decode_append_batched with the STACKED [B, L, ...] caches + a
    layer index == the same call on the pre-sliced layer slabs (the
    zero-copy addressing the vmapped model scans rely on; r3 replaced the
    custom_vmap rule's per-layer slab copies with this path)."""
    from triforce_tpu.ops.flash_decode import flash_decode_append_batched
    b, L, hkv, t, s, d = 3, 4, 2, 2, 512, 64
    layer = 2
    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 6)
    kst = jax.random.normal(ks[0], (b, L, hkv, s, d), jnp.float32)
    vst = jax.random.normal(ks[1], (b, L, hkv, s, d), jnp.float32)
    q = jax.random.normal(ks[2], (b, hkv, t, d), jnp.float32)
    kn = jax.random.normal(ks[3], (b, hkv, t, d), jnp.float32)
    vn = jax.random.normal(ks[4], (b, hkv, t, d), jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    nmask = jnp.broadcast_to(cols <= rows, (b, t, t))
    klen = jnp.asarray([300, 512, 129], jnp.int32)
    kw = {}
    kw_sl = {}
    if quant:
        from triforce_tpu.cache import quantize_tokens
        k8, ksc = quantize_tokens(kst)
        v8, vsc = quantize_tokens(vst)
        kst, vst = k8, v8
        kw = dict(k_scale=ksc, v_scale=vsc)
        kw_sl = dict(k_scale=ksc[:, layer], v_scale=vsc[:, layer])
    got = flash_decode_append_batched(
        q, kst, vst, kn, vn, klen, nmask, block=BLOCK, interpret=True,
        layer=jnp.int32(layer), **kw)
    want = flash_decode_append_batched(
        q, kst[:, layer], vst[:, layer], kn, vn, klen, nmask, block=BLOCK,
        interpret=True, **kw_sl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("t,k_len", [(256, 413), (512, 512)])
def test_kernel_wide_query_tiled_matches_xla(t, k_len):
    """Wide-query (tree verify) shapes run the q-TILED kernel path
    (gt > 128 -> in-kernel 128-row sub-tiles so the DMA block stays large —
    the r4 T>=256 verify-cliff fix). Must match the XLA path exactly."""
    from triforce_tpu.ops.flash_decode import _pick_qtile
    s, d = 512, 32
    hq = hkv = 1          # gt = t: 256/512 exercise q_tile 128
    assert _pick_qtile(hq // hkv * t) == 128
    q, k, v, kn, vn = _mk(hq, hkv, t, s, d, seed=t)
    want = attention.append_attention(q, k, v, kn, vn,
                                      k_len=jnp.asarray(k_len))
    got = append_attention_pallas(q, k, v, kn, vn,
                                  k_len=jnp.asarray(k_len), block=BLOCK,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_partials_wide_query_tiled_matches_xla():
    """Wide-query tiled partials (tree-grow prefix at level widths > 128)
    match the XLA partials path."""
    from triforce_tpu.ops.flash_decode import flash_decode_partials
    s, d, t = 512, 32, 256
    q, k, v, _, _ = _mk(1, 1, t, s, d, seed=9)
    k_len = jnp.asarray(300)
    m, l, acc = flash_decode_partials(q[0], k[0][None].reshape(1, s, d),
                                      v[0].reshape(1, s, d), k_len,
                                      block=BLOCK, interpret=True)
    want = attention.attention_partials(q, k, v, k_len=k_len)
    np.testing.assert_allclose(np.asarray(m).reshape(-1),
                               np.asarray(want[0]).reshape(-1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(l).reshape(-1),
                               np.asarray(want[1]).reshape(-1), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(acc).reshape(-1),
                               np.asarray(want[2]).reshape(-1), atol=2e-5,
                               rtol=2e-5)


def test_kernel_wide_query_tiled_quantized():
    """Wide + int8 cache: the tiled path dequantizes v once per block
    (shared across q tiles, bf16 pv — finer than the untiled path's int8
    p-requant) and must track the XLA dequantized path closely."""
    from triforce_tpu.cache import quantize_tokens
    s, d, t = 512, 32, 256
    q, k, v, kn, vn = _mk(1, 1, t, s, d, seed=3)
    k8, ksc = quantize_tokens(k[None])
    v8, vsc = quantize_tokens(v[None])
    want = attention.append_attention(q, k8[0], v8[0], kn, vn,
                                      k_len=jnp.asarray(300),
                                      k_scale=ksc[0], v_scale=vsc[0])
    got = append_attention_pallas(q, k8[0], v8[0], kn, vn,
                                  k_len=jnp.asarray(300), block=BLOCK,
                                  interpret=True, k_scale=ksc[0],
                                  v_scale=vsc[0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-2, rtol=5e-2)
