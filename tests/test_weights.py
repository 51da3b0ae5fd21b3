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
