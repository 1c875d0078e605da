import jax
import jax.numpy as jnp
import numpy as np

from aocr import optim


def _groups():
    return {
        "cnn": {"w": jnp.array([3.0, 4.0])},  # norm 5
        "encoder_fw": {"w": jnp.array([30.0, 40.0])},  # norm 50
        "encoder_bw": {"w": jnp.array([0.3, 0.4])},
        "decoder": {"w": jnp.array([0.0, 0.0])},
        "projector": {"w": jnp.array([5.0, 0.0]), "b": jnp.array([0.0, 12.0])},
    }


def test_clip_per_group():
    """Clipping is per group at norm 5 (reference optim_sgd.lua:50-52)."""
    grads, norms = optim.clip_grads_by_group(_groups())
    assert np.isclose(norms["encoder_fw"], 50.0)
    # scaled down to norm 5
    assert np.isclose(float(optim.group_norm(grads["encoder_fw"])), 5.0)
    # norm exactly 5: untouched (> comparison)
    np.testing.assert_allclose(grads["cnn"]["w"], [3.0, 4.0])
    # small norms untouched
    np.testing.assert_allclose(grads["encoder_bw"]["w"], [0.3, 0.4])
    # multi-leaf group: norm over the flattened group (13 here)
    assert np.isclose(norms["projector"], 13.0)
    assert np.isclose(float(optim.group_norm(grads["projector"])), 5.0)


def test_sgd_basic_update():
    params = {"cnn": {"w": jnp.array([1.0, 2.0])},
              "decoder": {"w": jnp.array([0.5])}}
    grads = {"cnn": {"w": jnp.array([1.0, 1.0])},
             "decoder": {"w": jnp.array([2.0])}}
    st = optim.sgd_init(params)
    new, st2, _ = optim.sgd_update(params, grads, st, jnp.float32(0.1))
    np.testing.assert_allclose(new["cnn"]["w"], [0.9, 1.9], rtol=1e-6)
    np.testing.assert_allclose(new["decoder"]["w"], [0.3], rtol=1e-6)
    assert int(st2.eval_counter) == 1


def test_sgd_momentum_nesterov():
    params = {"g": {"w": jnp.array([0.0])}}
    grads = {"g": {"w": jnp.array([1.0])}}
    hyper = optim.SGDHyper(momentum=0.9, dampening=0.0, nesterov=False)
    st = optim.sgd_init(params, hyper)
    # step 1: buffer = g, update = -lr*g
    p1, st1, _ = optim.sgd_update(params, grads, st, jnp.float32(1.0), hyper)
    np.testing.assert_allclose(p1["g"]["w"], [-1.0], rtol=1e-6)
    # step 2: buffer = 0.9*g + g = 1.9
    p2, st2, _ = optim.sgd_update(p1, grads, st1, jnp.float32(1.0), hyper)
    np.testing.assert_allclose(p2["g"]["w"], [-2.9], rtol=1e-6)


def test_momentum_first_use_keyed_on_buffer_not_counter():
    """Enabling momentum on a RESUMED run (eval_counter > 0, fresh zero
    buffer) must still take buf := grad on the first momentum step — the
    reference keys first-use on the buffer not existing yet
    (optim_sgd.lua:60-63), not on the step counter."""
    params = {"g": {"w": jnp.array([0.0])}}
    grads = {"g": {"w": jnp.array([1.0])}}
    hyper = optim.SGDHyper(momentum=0.9, dampening=0.0)
    st = optim.SGDState(
        eval_counter=jnp.asarray(100, jnp.int32),  # resumed mid-training
        momentum_buf=jax.tree.map(jnp.zeros_like, params),
        buf_fresh=jnp.asarray(True),
    )
    p1, st1, _ = optim.sgd_update(params, grads, st, jnp.float32(1.0), hyper)
    np.testing.assert_allclose(p1["g"]["w"], [-1.0], rtol=1e-6)  # buf := g
    assert not bool(st1.buf_fresh)
    # and a restored (warm) buffer must NOT be overwritten with g
    st_warm = st._replace(momentum_buf={"g": {"w": jnp.array([2.0])}},
                          buf_fresh=jnp.asarray(False))
    p2, _, _ = optim.sgd_update(params, grads, st_warm, jnp.float32(1.0),
                                hyper)
    # buf = 0.9*2 + 1 = 2.8
    np.testing.assert_allclose(p2["g"]["w"], [-2.8], rtol=1e-6)


def test_sgd_lr_annealing():
    params = {"g": {"w": jnp.array([0.0])}}
    grads = {"g": {"w": jnp.array([1.0])}}
    hyper = optim.SGDHyper(learning_rate_decay=1.0)
    st = optim.sgd_init(params, hyper)
    p1, st1, _ = optim.sgd_update(params, grads, st, jnp.float32(1.0), hyper)
    np.testing.assert_allclose(p1["g"]["w"], [-1.0], rtol=1e-6)  # clr = 1/(1+0)
    p2, _, _ = optim.sgd_update(p1, grads, st1, jnp.float32(1.0), hyper)
    np.testing.assert_allclose(p2["g"]["w"], [-1.5], rtol=1e-6)  # clr = 1/(1+1)


def test_sgd_weight_decay_applied_after_clip():
    """Reference order (optim_sgd.lua:50-58): clip at 5 first, then
    dfdx:add(wd, y) — weight decay is NOT clipped."""
    params = {"g": {"w": jnp.array([10.0, 0.0])}}
    grads = {"g": {"w": jnp.array([30.0, 40.0])}}  # norm 50 -> clip to 5
    hyper = optim.SGDHyper(weight_decay=0.1)
    st = optim.sgd_init(params, hyper)
    p1, _, _ = optim.sgd_update(params, grads, st, jnp.float32(1.0), hyper)
    # clipped grad = [3, 4]; + wd*p = [4, 4]; update = -1.0 * that
    np.testing.assert_allclose(p1["g"]["w"], [10.0 - 4.0, -4.0], rtol=1e-6)


def test_sgd_dampening():
    params = {"g": {"w": jnp.array([0.0])}}
    grads = {"g": {"w": jnp.array([1.0])}}
    hyper = optim.SGDHyper(momentum=0.5, dampening=0.5)
    st = optim.sgd_init(params, hyper)
    p1, st1, _ = optim.sgd_update(params, grads, st, jnp.float32(1.0), hyper)
    np.testing.assert_allclose(p1["g"]["w"], [-1.0], rtol=1e-6)  # buf := g
    # buf = 0.5*1 + (1-0.5)*1 = 1.0 -> same step again
    p2, _, _ = optim.sgd_update(p1, grads, st1, jnp.float32(1.0), hyper)
    np.testing.assert_allclose(p2["g"]["w"], [-2.0], rtol=1e-6)


def test_hyper_from_config_dampening_rule():
    """dampening unset (<0) defaults to momentum — the reference's
    `damp = config.dampening or mom` (optim_sgd.lua:32)."""
    from aocr.config import Config

    h = optim.hyper_from_config(Config(momentum=0.9))
    assert h.dampening == 0.9
    h2 = optim.hyper_from_config(Config(momentum=0.9, dampening=0.0,
                                        nesterov=True))
    assert h2.dampening == 0.0 and h2.nesterov
    import pytest

    with pytest.raises(AssertionError):
        Config(nesterov=True).validate()  # nesterov needs momentum
    with pytest.raises(AssertionError):
        Config(nesterov=True, momentum=0.9).validate()  # damp defaults to mom


def test_adadelta_moves_params():
    params = {"g": {"w": jnp.array([1.0, -1.0])}}
    grads = {"g": {"w": jnp.array([0.5, 0.5])}}
    st = optim.adadelta_init(params)
    p1, st1, _ = optim.adadelta_update(params, grads, st)
    assert not np.allclose(p1["g"]["w"], params["g"]["w"])
    # direction opposes gradient
    assert p1["g"]["w"][0] < 1.0 and p1["g"]["w"][1] < -1.0
