import jax
import jax.numpy as jnp
import numpy as np

from ocrjax import weights as W
from ocrjax.charset import Charset
from ocrjax.config import TINY
from ocrjax.models.crnn import create_crnn


def test_save_load_roundtrip(tmp_path):
    model = create_crnn(TINY, num_classes=8)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 64, 1), jnp.float32))
    p = str(tmp_path / "rec.safetensors")
    W.save_variables(p, variables, metadata={"kind": "crnn"})
    loaded = W.load_variables(p)
    assert W.load_metadata(p)["kind"] == "crnn"

    flat_a = W._flatten(jax.tree.map(np.asarray, variables))
    flat_b = W._flatten(jax.tree.map(np.asarray, loaded))
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k], err_msg=k)

    # loaded variables drive the model identically
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 64, 1), jnp.float32)
    a = model.apply(variables, x)[0]
    b = model.apply(loaded, x)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_charset_sidecar(tmp_path):
    cs = Charset("abc ")
    p = str(tmp_path / "rec.safetensors")
    side = W.save_charset_sidecar(p, cs)
    assert side.endswith("rec.charset.txt")
    assert Charset.from_file(side).chars == cs.chars


def test_torch_layout_conversion():
    import torch
    sd = {
        "conv.weight": torch.zeros(8, 3, 3, 3),   # OIHW
        "fc.weight": torch.zeros(10, 4),          # (out, in)
        "fc.bias": torch.zeros(10),
    }
    flat = W.torch_state_dict_to_flat(sd)
    assert flat["conv.weight"].shape == (3, 3, 3, 8)  # HWIO
    assert flat["fc.weight"].shape == (4, 10)
    assert flat["fc.bias"].shape == (10,)


def test_from_pretrained_merges_det_config_metadata(tmp_path):
    """Structural det fields (det_head_stride) ride the det file's metadata
    so from_pretrained builds the matching model for the weights."""
    import json

    import jax
    import jax.numpy as jnp

    from ocrjax import weights as W
    from ocrjax.api import OcrEngine
    from ocrjax.charset import Charset
    from ocrjax.config import TINY
    from ocrjax.models.crnn import create_crnn
    from ocrjax.models.db import create_db

    cfg = TINY.replace(det_head_stride=4)
    charset = Charset("ab")
    rec = create_crnn(cfg, charset.num_classes)
    rec_v = rec.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, cfg.rec_height, 64, 1), jnp.float32))
    det = create_db(cfg)
    det_v = det.init(jax.random.PRNGKey(1),
                     jnp.zeros((1, 64, 64, 3), jnp.float32))
    W.save_variables(str(tmp_path / "rec.safetensors"), rec_v, metadata={
        "config": json.dumps({
            "rec_hidden": cfg.rec_hidden,
            "rec_conv_channels": list(cfg.rec_conv_channels)})})
    W.save_variables(str(tmp_path / "det.safetensors"), det_v, metadata={
        "config": json.dumps({"det_head_stride": 4})})
    charset.to_file(str(tmp_path / "rec.charset.txt"))

    eng = OcrEngine.from_pretrained(path=str(tmp_path))
    assert eng.config.det_head_stride == 4
    assert eng.config.rec_hidden == cfg.rec_hidden
    # the loaded det weights actually apply under the merged config
    from ocrjax.api_det import _det_state
    # keep the canvas tiny for CPU speed
    eng.config = eng.config.replace(det_max_side=64)
    st = _det_state(eng)
    prob = st.model.apply(st.variables,
                          jnp.zeros((1, 64, 64, 3), jnp.float32))["prob"]
    assert prob.shape == (1, 16, 16)
