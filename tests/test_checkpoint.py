"""Checkpoint subsystem: msgpack snapshots, torch interop round-trip, orbax resume."""

import numpy as np
import pytest

from clip_codec_tpu.utils.checkpoint import TrainCheckpointer, load_params, save_params


def test_msgpack_roundtrip(tmp_path, rng):
    params = {"a": {"kernel": rng.standard_normal((4, 8)).astype(np.float32)},
              "b": rng.standard_normal(3).astype(np.float32)}
    p = save_params(tmp_path / "x.msgpack", params)
    out = load_params(p)
    np.testing.assert_array_equal(out["a"]["kernel"], params["a"]["kernel"])
    np.testing.assert_array_equal(out["b"], params["b"])


def test_torch_export_import_roundtrip(rng):
    """export_unet -> convert_unet is the identity on our param tree."""
    pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from clip_codec_tpu.models import CLIPCondUNet
    from clip_codec_tpu.weights.convert import convert_unet
    from clip_codec_tpu.weights.export import export_unet

    net = CLIPCondUNet(z_dim=16, base=8, ch_mult=(1, 2), img_ch=3)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                      jnp.zeros((1, 16)), jnp.zeros((1,), jnp.int32))["params"]
    sd = export_unet(params, (1, 2))
    back = convert_unet(sd, (1, 2))
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_orbax_resume(tmp_path, rng):
    import jax

    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}, "step": np.int32(7)}
    ck = TrainCheckpointer(tmp_path / "ck")
    ck.save(7, state)
    assert ck.latest_step() == 7
    template = jax.tree_util.tree_map(np.zeros_like, state)
    restored = ck.restore(template)
    np.testing.assert_array_equal(restored["params"]["w"], state["params"]["w"])
    assert int(restored["step"]) == 7
    # fresh checkpointer sees the same state
    ck2 = TrainCheckpointer(tmp_path / "ck")
    assert ck2.latest_step() == 7


def test_nan_checked_wrapper():
    import jax.numpy as jnp

    from clip_codec_tpu.utils.debug import assert_finite_tree, nan_checked

    def div(x, y):
        return x / y

    f = nan_checked(div)
    assert float(f(jnp.float32(6.0), jnp.float32(2.0))) == 3.0
    import pytest as _pytest

    with _pytest.raises(Exception, match="division by zero|nan"):
        f(jnp.float32(0.0), jnp.float32(0.0))

    assert_finite_tree({"a": np.ones(3)})
    with _pytest.raises(FloatingPointError, match="non-finite"):
        assert_finite_tree({"a": np.array([1.0, np.nan])}, "params")
