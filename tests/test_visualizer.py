import json
import os

from aocr.visualizer import generate_html


def test_generate(tmp_path):
    out = tmp_path / "results"
    out.mkdir()
    (out / "results.txt").write_text(
        "images/a.png\thello\thello\t-0.5\t-0.6\n"
        "images/b.png\tworld\twordl\t-1.5\t-1.6\n"
        "malformed line\n"
    )
    freq = {"hello": 10, "world": 5}
    fp = tmp_path / "freq.json"
    fp.write_text(json.dumps(freq))
    path = generate_html.generate(str(out), str(tmp_path), str(fp))
    assert os.path.exists(path)
    html = open(path).read()
    assert "f-correct" in html and "f-incorrect" in html
    assert "gold frequency: 10 out of 15" in html
    assert "wordl" in html


def test_generate_copies_images(tmp_path):
    out = tmp_path / "results"
    out.mkdir()
    imgdir = tmp_path / "images"
    imgdir.mkdir()
    (imgdir / "a.png").write_bytes(b"\x89PNG fake")
    # 'x/a.png' and 'x_a.png' must not collide in the flattened gallery dir.
    (tmp_path / "images_a.png").write_bytes(b"\x89PNG other")
    (out / "results.txt").write_text(
        "images/a.png\tx\tx\t-1\t-1\nimages_a.png\ty\ty\t-1\t-1\n"
    )
    generate_html.generate(str(out), str(tmp_path))
    gallery = out / "website" / "images"
    copied = sorted(os.listdir(gallery))
    assert len(copied) == 2
    assert all(f.endswith(("a.png",)) for f in copied)
    contents = {open(gallery / f, "rb").read() for f in copied}
    assert contents == {b"\x89PNG fake", b"\x89PNG other"}


def test_missing_results_raises(tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        generate_html.generate(str(tmp_path), str(tmp_path))
