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


def test_varsize_matches_host_path(np_rng):
    """preprocess_varsize on a padded mixed-size batch must match per-image
    host preprocessing (luminance + clipped-aspect bilinear resize)."""
    sizes = [(48, 160), (31, 99), (64, 200), (17, 333)]
    hp, wp = 64, 384
    raws = [np_rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            for h, w in sizes]
    buf = np.zeros((len(raws), hp, wp, 3), np.uint8)
    for i, r in enumerate(raws):
        buf[i, : r.shape[0], : r.shape[1]] = r
    out = np.asarray(preprocess.preprocess_varsize(
        buf, np.array(sizes, np.int32), 32, 100))
    assert out.shape == (len(raws), 32, 100, 1)
    for i, r in enumerate(raws):
        lum = data._rgb_to_luminance(r.astype(np.float32) / 255.0) * 255.0
        host = data._bilinear_resize(lum, 32, 100)
        np.testing.assert_allclose(out[i, :, :, 0], host, rtol=1e-4,
                                   atol=0.05)


def test_datagen_device_mode_matches_host_mode(tmp_path, np_rng):
    """DataGen batches under -device_preprocess (host decodes bytes only,
    device does luminance/resize) must match the host-preprocessed batches
    for the same manifest, including non-uniform source sizes."""
    from PIL import Image

    from aocr import preprocess as pp
    from tests import synth

    d = tmp_path
    (d / "images").mkdir()
    labels = ["abc", "de", "fgh1", "xy"]
    lines = []
    for i, lab in enumerate(labels):
        h, w = [(48, 160), (32, 100), (56, 222), (40, 131)][i]
        img = np_rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        p = f"images/{i}_{lab}.png"
        Image.fromarray(img).save(d / p)
        lines.append(f"{p} {lab}")
    (d / "train.txt").write_text("\n".join(lines) + "\n")

    cfg_host = Config(decode_workers=0)
    cfg_dev = cfg_host.replace(device_preprocess=True)
    host_gen = data.DataGen(str(d), "train.txt", cfg_host)
    dev_gen = data.DataGen(str(d), "train.txt", cfg_dev)
    hb = host_gen.next_batch(4)
    db = dev_gen.next_batch(4)
    assert db.images is None and db.raw is not None
    assert db.raw.dtype == np.uint8
    assert list(db.img_paths) == list(hb.img_paths)
    np.testing.assert_array_equal(db.targets, hb.targets)
    dev_images = np.asarray(pp.preprocess_varsize(
        db.raw, db.sizes, cfg_dev.image_height, db.out_w))
    np.testing.assert_allclose(dev_images, hb.images, rtol=1e-4, atol=0.5)


def test_device_preprocess_cli(tmp_path):
    """-device_preprocess trains end-to-end and reaches a checkpoint."""
    import os

    from aocr import checkpoint
    from aocr.train import main
    from tests import synth

    d = str(tmp_path)
    labels = ["ab", "cd", "ef", "gh"]
    synth.make_dataset(d, labels, "train.txt", width=32)
    synth.make_dataset(d, labels, "val.txt", width=32)
    main([
        "-data_base_dir", d, "-data_path", "train.txt",
        "-val_data_path", "val.txt",
        "-model_dir", os.path.join(d, "model"),
        "-log_path", os.path.join(d, "log.txt"),
        "-batch_size", "4", "-num_batches_val", "1",
        "-encoder_num_hidden", "16", "-target_embedding_size", "8",
        "-max_decoder_l", "8", "-image_width", "32", "-input_feed",
        "-device_preprocess",
        "-phase", "train", "-num_epochs", "1", "-steps_per_checkpoint", "2",
    ])
    assert checkpoint.try_load_final(os.path.join(d, "model")) is not None
