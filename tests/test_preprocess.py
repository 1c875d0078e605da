import numpy as np

from aocr import data, preprocess
from aocr.config import Config


def test_matches_host_path(np_rng):
    """Device-preprocessed batches must match the host (numpy/PIL) path."""
    raw = np_rng.randint(0, 256, (3, 48, 160, 3)).astype(np.uint8)
    out = np.asarray(preprocess.preprocess_batch(raw, 32, 100))
    assert out.shape == (3, 32, 100, 1)
    cfg = Config()
    for i in range(3):
        lum = data._rgb_to_luminance(raw[i].astype(np.float32) / 255.0) * 255.0
        host = data._bilinear_resize(lum, 32, 100)
        np.testing.assert_allclose(out[i, :, :, 0], host, rtol=1e-4, atol=0.05)


def test_grayscale_input(np_rng):
    raw = np_rng.randint(0, 256, (2, 32, 100)).astype(np.uint8)
    out = np.asarray(preprocess.preprocess_batch(raw, 32, 100))
    np.testing.assert_allclose(out[..., 0], raw.astype(np.float32),
                               rtol=1e-5, atol=1e-3)


def test_normalized_range(np_rng):
    raw = np_rng.randint(0, 256, (2, 40, 120, 3)).astype(np.uint8)
    out = np.asarray(preprocess.preprocess_and_normalize(raw, 32, 100))
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5


def test_identity_when_same_size(np_rng):
    raw = np_rng.randint(0, 256, (1, 32, 100, 1)).astype(np.uint8)
    out = np.asarray(preprocess.preprocess_batch(raw, 32, 100))
    np.testing.assert_allclose(out[0, :, :, 0], raw[0, :, :, 0].astype(np.float32),
                               atol=1e-3)
