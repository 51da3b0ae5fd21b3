"""Checkpoint/resume (SURVEY.md §5) + structured logging tests."""

import io
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # training loop + checkpoint I/O
import optax

from ocrjax.charset import Charset
from ocrjax.config import TINY
from ocrjax.models.crnn import create_crnn
from ocrjax.train import checkpoint as C
from ocrjax.utils.logging import get_logger, log_fields


def test_train_state_roundtrip(tmp_path):
    model = create_crnn(TINY, num_classes=6)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 64, 1), jnp.float32))
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    p = str(tmp_path / "rec_120.safetensors")
    C.save_train_state(p, 120, variables["params"],
                       variables["batch_stats"], opt_state)
    step, params, bs, opt2 = C.load_train_state(p, tx.init(
        variables["params"]))
    assert step == 120
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), variables["params"], params)
    # opt state restores with the same tree structure and values
    flat_a, tda = jax.tree_util.tree_flatten(opt_state)
    flat_b, tdb = jax.tree_util.tree_flatten(opt2)
    assert tda == tdb
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_checkpoint(tmp_path):
    d = str(tmp_path)
    model = create_crnn(TINY, num_classes=6)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 64, 1), jnp.float32))
    tx = optax.adam(1e-3)
    opt = tx.init(variables["params"])
    for s in (100, 300, 200):
        C.save_train_state(f"{d}/rec_{s}.safetensors", s,
                           variables["params"], variables["batch_stats"], opt)
    assert C.latest_checkpoint(d, "rec_").endswith("rec_300.safetensors")
    assert C.latest_checkpoint(d, "det_") is None
    assert C.latest_checkpoint("/nonexistent", "rec_") is None


def test_rec_trainer_resume(tmp_path):
    """2 steps, checkpoint, then 'resume' picks up at step 2."""
    from ocrjax.train.rec_trainer import train_rec

    logs = []
    kwargs = dict(config=TINY, charset=Charset("ab"), steps=2, batch_size=2,
                  width=64, log_every=1, ckpt_dir=str(tmp_path),
                  ckpt_every=1, max_len=2, log=logs.append)
    train_rec(**kwargs)
    logs2 = []
    train_rec(**{**kwargs, "steps": 3, "log": logs2.append})
    assert any("resumed" in m and "step 2" in m for m in logs2), logs2
    # only one new step was run
    assert any("[rec 3/3]" in m for m in logs2)
    assert not any("[rec 1/3]" in m for m in logs2)


def test_json_logger():
    buf = io.StringIO()
    lg = get_logger("t.json", json_logs=True, stream=buf)
    log_fields(lg, "hello", pages=3, ok=True)
    rec = json.loads(buf.getvalue())
    assert rec["msg"] == "hello" and rec["pages"] == 3 and rec["ok"] is True
