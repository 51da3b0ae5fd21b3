"""CLI surface tests (R10). In-process main() with the checked-in assets."""

import json
import os

import cv2
import numpy as np
import pytest

from ocrjax import cli
from ocrjax.train.synth import render_line

ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(ASSETS, "rec.safetensors")),
    reason="no trained assets")


@pytest.fixture(scope="module")
def strip_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cli") / "strip.png")
    cv2.imwrite(p, render_line("Sum: 4289", height=32))
    return p


def test_recognize_json(strip_path, capsys):
    rc = cli.main(["recognize", strip_path, "--json"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out[0]["image"] == strip_path
    assert out[0]["text"] == "Sum: 4289"
    assert 0 <= out[0]["confidence"] <= 1


def test_recognize_plain(strip_path, capsys):
    rc = cli.main(["recognize", strip_path])
    assert rc == 0
    assert "Sum: 4289" in capsys.readouterr().out


def test_missing_file_clean_error(capsys):
    rc = cli.main(["recognize", "/nope/missing.png"])
    assert rc == 1
    assert "error:" in capsys.readouterr().err


def test_no_images_is_usage_error(capsys):
    rc = cli.main(["ocr"])
    assert rc == 2


def test_charset_size_mismatch(tmp_path, strip_path):
    bad = tmp_path / "bad_charset.txt"
    bad.write_text("a\nb\n")
    with pytest.raises(SystemExit):
        cli.main(["recognize", strip_path, "--charset", str(bad)])


def test_detect_viz_writes_image(tmp_path, capsys):
    from ocrjax.train.synth import render_page
    from ocrjax.charset import default_charset

    rng = np.random.RandomState(5)
    page, quads, _ = render_page(rng, default_charset(), size=(320, 320),
                                 n_lines=(2, 3))
    src = str(tmp_path / "page.png")
    cv2.imwrite(src, page)
    dest = str(tmp_path / "viz.png")
    rc = cli.main(["detect", src, "--viz", dest])
    capsys.readouterr()
    assert rc == 0
    viz = cv2.imread(dest)
    assert viz is not None and viz.shape[:2] == (320, 320)
    # green quad outlines actually drawn
    g = (viz[:, :, 1].astype(int) - viz[:, :, 2].astype(int)) > 100
    assert g.sum() > 50
