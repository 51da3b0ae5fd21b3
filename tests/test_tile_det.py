"""Tile-scale detector variant + blank-tile prescreen (VERDICT r4 next #1).

The dense C5 roofline named tile detection the top compute sink (540
GF/page, DESIGN.md §6c); the dedicated cheap variant (models.db.DB_ARCHS
['tile']) plus the blank-tile prescreen attack it. These tests pin the
plumbing on CPU with random weights; quality gates live in test_tpu.py.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ocrjax.api import OcrEngine  # noqa: E402
from ocrjax.config import TINY  # noqa: E402
from ocrjax.models.db import DB_ARCHS, create_db_arch  # noqa: E402
from ocrjax import tiling  # noqa: E402


def _tile_engine():
    eng = OcrEngine(config=TINY)
    arch = dict(DB_ARCHS["tile"])
    m = create_db_arch(TINY, arch)
    eng.tile_det_variables = m.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    eng.tile_det_arch = arch
    return eng


def test_tile_arch_is_smaller():
    """The variant's parameter count must be well below the flagship's —
    the whole point is fewer FLOPs on the dense path."""
    flag = create_db_arch(TINY, DB_ARCHS["flagship"])
    tile = create_db_arch(TINY, DB_ARCHS["tile"])
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)

    def n_params(m):
        v = m.init(jax.random.PRNGKey(0), x)
        return sum(p.size for p in jax.tree_util.tree_leaves(v["params"]))

    nf, nt = n_params(flag), n_params(tile)
    assert nt < nf / 3, (nt, nf)


def test_tile_forward_routes_variant():
    """_tile_forward must build the variant model when the asset is
    loaded + enabled, and fall back to the flagship when disabled."""
    eng = _tile_engine()
    fwd, tcfg = tiling._tile_forward(eng)
    v = tiling._tile_det_vars(eng)
    assert v is eng.tile_det_variables
    # variant program runs on the variant's parameter tree
    tiles = np.full((1, TINY.tile_size, TINY.tile_size), 255, np.uint8)
    from ocrjax import preprocess
    packed = fwd(v, jnp.asarray(preprocess.pack_for_upload(tiles, TINY)))
    assert np.asarray(packed).shape[0] == 1
    # disabled -> flagship variables
    eng.config = TINY.replace(tile_det_enable=False)
    eng._tile_fwd_cache = None
    v2 = tiling._tile_det_vars(eng)
    assert v2 is not eng.tile_det_variables


def test_blank_tile_prescreen_drops_only_blank():
    eng = _tile_engine()
    img = np.full((600, 600, 3), 255, np.uint8)
    img[20:40, 20:120] = 0  # ink in the top-left tile only
    full_plan = tiling.tile_plan(600, 600, TINY)
    corners, groups = tiling._prep_page(eng, img)
    assert len(corners) < len(full_plan)
    # the inked tile survives
    assert any(y <= 20 and x <= 20 for (y, x, th, tw) in corners)
    # rows in groups align with corners
    assert sum(g.shape[0] for g in groups) == len(corners)
    # noise above the contrast floor keeps every tile (conservative rule);
    # base shade 200 so the ±20 sensor noise isn't clipped away at 255
    rng = np.random.RandomState(0)
    noisy = np.clip(np.full(img.shape, 200, np.int16)
                    + rng.randint(-20, 21, img.shape), 0, 255).astype(np.uint8)
    noisy[20:40, 20:120] = 0
    corners_n, _ = tiling._prep_page(eng, noisy)
    assert len(corners_n) == len(full_plan)
    # prescreen off -> full plan
    eng.config = TINY.replace(tile_blank_skip=False)
    corners2, _ = tiling._prep_page(eng, img)
    assert len(corners2) == len(full_plan)


def test_blank_page_keeps_one_tile():
    eng = _tile_engine()
    img = np.full((600, 600, 3), 255, np.uint8)
    corners, groups = tiling._prep_page(eng, img)
    assert len(corners) == 1
    res = eng.ocr_tiled(img)
    assert res.lines == []


def test_tiled_window_single_fetch_matches_per_group():
    """The one-concat window fetch must return the same candidates as the
    per-group fetch path (tiling._fetch_group)."""
    eng = _tile_engine()
    eng.config = TINY.replace(tile_blank_skip=False)
    rng = np.random.RandomState(1)
    from ocrjax.train import synth
    from ocrjax.charset import default_charset
    page, _, _ = synth.render_page(rng, default_charset(), size=(600, 600),
                                   n_lines=(4, 6))
    img = np.repeat(page[..., None], 3, axis=2)
    corners, groups = tiling._prep_page(eng, img)
    assert len(groups) > 1  # heterogeneous tiles: several shape groups
    disp = [(([(0, g.shape[0])]), tiling._dispatch_group(eng, g))
            for g in groups]
    # per-group reference
    ref = [tiling._fetch_group(eng, d) for _, d in disp]
    # one-fetch path: concat on device, single materialization
    from ocrjax.api_det import fetch_det
    _, tcfg = tiling._tile_forward(eng)
    pcat = jnp.concatenate([d[1] for _, d in disp])
    b, s, v = fetch_det([pcat], tcfg)
    off = 0
    for (_, d), (_, rb, rs, rv) in zip(disp, ref):
        n = d[1].shape[0]
        np.testing.assert_array_equal(v[off:off + n], rv)
        np.testing.assert_allclose(b[off:off + n], rb, atol=1e-5)
        off += n


def test_pretrained_engine_loads_tile_det():
    """The shipped assets include the tile variant and the default engine
    routes C5 detection through it (the dense TPU gates then exercise its
    quality end-to-end)."""
    eng = OcrEngine.from_pretrained()
    assert eng.tile_det_variables is not None
    assert eng.tile_det_arch and eng.tile_det_arch.get("channels")
    assert eng.config.tile_det_enable
    assert tiling._tile_det_vars(eng) is eng.tile_det_variables
