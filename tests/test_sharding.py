"""Mesh/sharding tests on 8 fake CPU devices (SURVEY.md §4 "Distributed
without a cluster"): DP gradient equivalence vs single-device, TP logit
equivalence, sharded train-step execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from speech_tranformer_pytorch_tpu.config import tiny_config
from speech_tranformer_pytorch_tpu.data.synthetic import (
    batch_from_dataset, make_synthetic_dataset)
from speech_tranformer_pytorch_tpu.parallel import (
    batch_shardings, make_mesh, make_sharded_train_step, param_spec,
    shard_train_state, state_shardings)
from speech_tranformer_pytorch_tpu.train import (create_train_state,
                                                 make_train_step)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 fake cpu devices")


@pytest.fixture(scope="module")
def cfg():
    c = tiny_config()
    # TP-friendly dims: heads % model_axis == 0, d_ff % model_axis == 0.
    return c.replace(model=c.model.replace(
        vocab_size=32, d_model=64, num_heads=4, d_ff=128,
        num_encoder_layers=2, num_decoder_layers=2, dropout_rate=0.0,
        subsample_channels=8))


@pytest.fixture(scope="module")
def batch(cfg):
    ds = make_synthetic_dataset(8, vocab_size=32, seed=2)
    return batch_from_dataset(ds, cfg.features)


def test_mesh_shapes():
    mesh = make_mesh(model_axis_size=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(model_axis_size=1)
    assert mesh.shape == {"data": 8, "model": 1}
    with pytest.raises(ValueError):
        make_mesh(model_axis_size=3)


def test_param_spec_rules():
    x3 = jnp.zeros((4, 4, 16))
    x2 = jnp.zeros((4, 16))
    assert param_spec("params/encoder/layer_0/self_attn/q/kernel", x3) == P(None, "model", None)
    x4q = jnp.zeros((16, 3, 4, 4))
    assert param_spec("params/encoder/layer_0/self_attn/qkv/kernel", x4q) \
        == P(None, None, "model", None)
    assert param_spec("params/decoder/layer_0/self_attn/qkv/bias",
                      jnp.zeros((3, 4, 4))) == P(None, "model", None)
    assert param_spec("params/decoder/layer_1/cross_attn/out/kernel", x3) == P("model", None, None)
    assert param_spec("params/encoder/layer_0/FeedForward_0/Dense_0/kernel", x2) == P(None, "model")
    assert param_spec("params/decoder/embed/embedding", x2) == P(None, "model")
    assert param_spec("params/encoder/subsample/Conv_0/kernel", jnp.zeros((3, 3, 1, 8))) == P()
    assert param_spec("params/encoder/layer_0/LayerNorm_0/scale", jnp.zeros((16,))) == P()


def _loss_and_grads(cfg, params, batch):
    from speech_tranformer_pytorch_tpu.models import SpeechTransformer
    from speech_tranformer_pytorch_tpu.ops.losses import \
        label_smoothed_cross_entropy
    model = SpeechTransformer(cfg.model)

    def loss_fn(p):
        logits = model.apply(p, batch.feats, batch.frame_lens,
                             batch.targets_in, batch.target_lens)
        return label_smoothed_cross_entropy(
            logits, batch.targets_out, smoothing=cfg.train.label_smoothing)[0]
    return jax.value_and_grad(loss_fn)(params)


def _assert_grads_close(ref, got, rtol=1e-4, atol=1e-6):
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(ref)[0],
            jax.tree_util.tree_flatten_with_path(got)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=rtol, atol=atol, err_msg=str(pa))


def _sharded_grads(cfg, mesh, state, batch):
    from speech_tranformer_pytorch_tpu.parallel.sharding import param_shardings
    p_sh = param_shardings(mesh, state.params)
    b_sh = batch_shardings(mesh, batch)
    sparams = jax.tree.map(jax.device_put, state.params, p_sh)
    sbatch = jax.tree.map(jax.device_put, batch, b_sh)
    fn = jax.jit(lambda p, b: _loss_and_grads(cfg, p, b),
                 in_shardings=(p_sh, b_sh),
                 out_shardings=(None, p_sh))
    return fn(sparams, sbatch)


def test_dp_matches_single_device(cfg, batch):
    """DP-sharded gradients == unsharded gradients (all-reduce correct)."""
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    ref_loss, ref_grads = jax.jit(
        lambda p, b: _loss_and_grads(cfg, p, b))(state.params, batch)

    mesh = make_mesh(model_axis_size=1)
    loss, grads = _sharded_grads(cfg, mesh, state, batch)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    _assert_grads_close(ref_grads, grads)


def test_tp_matches_single_device(cfg, batch):
    """DP×TP (4×2) gradients == unsharded (Megatron decomposition correct)."""
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    ref_loss, ref_grads = jax.jit(
        lambda p, b: _loss_and_grads(cfg, p, b))(state.params, batch)

    mesh = make_mesh(model_axis_size=2)
    loss, grads = _sharded_grads(cfg, mesh, state, batch)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    _assert_grads_close(ref_grads, grads)


def test_sharded_params_actually_distributed(cfg, batch):
    mesh = make_mesh(model_axis_size=2)
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    sstate = shard_train_state(state, mesh)
    # find an attention qkv kernel and confirm it is sharded over 'model'
    flat = jax.tree_util.tree_flatten_with_path(sstate.params)[0]
    found = False
    for path, leaf in flat:
        p = "/".join(str(getattr(x, "key", x)) for x in path)
        if p.endswith("self_attn/qkv/kernel"):
            spec = leaf.sharding.spec
            assert spec == P(None, None, "model", None), (p, spec)
            found = True
        if p.endswith("cross_attn/q/kernel"):
            spec = leaf.sharding.spec
            assert spec == P(None, "model", None), (p, spec)
            found = True
    assert found


def test_multi_step_training_under_mesh(cfg, batch):
    """Loss decreases over sharded steps (end-to-end mesh training)."""
    mesh = make_mesh(model_axis_size=2)
    state = create_train_state(cfg, jax.random.PRNGKey(0), batch,
                               sharded=True)
    sstate = shard_train_state(state, mesh)
    sbatch = jax.tree.map(jax.device_put, batch, batch_shardings(mesh, batch))
    step = make_sharded_train_step(cfg, mesh)(state, batch)
    rng = jax.random.PRNGKey(3)
    losses = []
    for _ in range(20):
        sstate, metrics = step(sstate, sbatch, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_sharded_audio_train_step(cfg):
    """Full production path (audio -> fbank -> model -> update) under the
    mesh: runs, finite, and loss decreases."""
    from speech_tranformer_pytorch_tpu.data.synthetic import (
        batch_from_dataset, make_synthetic_dataset)
    from speech_tranformer_pytorch_tpu.data.pipeline import (
        AudioBatch, make_preprocess_fn)
    from speech_tranformer_pytorch_tpu.parallel.sharding import (
        audio_batch_shardings, make_sharded_audio_train_step)

    ds = make_synthetic_dataset(8, vocab_size=32, seed=7)
    import numpy as np_
    max_s = max(len(w) for w in ds.waves)
    audio = np_.zeros((8, max_s), np_.float32)
    slens = np_.zeros((8,), np_.int32)
    for i, w in enumerate(ds.waves):
        audio[i, :len(w)] = w
        slens[i] = len(w)
    u = max(len(t) for t in ds.transcripts) + 1
    tin = np_.zeros((8, u), np_.int32); tout = np_.zeros((8, u), np_.int32)
    tlens = np_.zeros((8,), np_.int32)
    for i, t in enumerate(ds.transcripts):
        tin[i, 0] = 1; tin[i, 1:1+len(t)] = t
        tout[i, :len(t)] = t; tout[i, len(t)] = 2
        tlens[i] = len(t) + 1
    abatch = AudioBatch(jnp.asarray(audio), jnp.asarray(slens),
                        jnp.asarray(tin), jnp.asarray(tout),
                        jnp.asarray(tlens), jnp.ones((8,), bool))

    pre = make_preprocess_fn(cfg.features, None)
    example = jax.jit(pre)(abatch)
    state = create_train_state(cfg, jax.random.PRNGKey(0), example,
                               sharded=True)

    mesh = make_mesh(model_axis_size=2)
    sstate = shard_train_state(state, mesh)
    sbatch = jax.tree.map(jax.device_put, abatch,
                          audio_batch_shardings(mesh, abatch))
    step = make_sharded_audio_train_step(cfg, mesh)(state, abatch)
    losses = []
    for _ in range(10):
        sstate, m = step(sstate, sbatch, jax.random.PRNGKey(2))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_param_spec_stacked_scan_layout():
    """scan_layers stacked kernels get a leading replicated layer axis."""
    x4 = jnp.zeros((12, 4, 4, 16))    # [layers, d, H, Dh]
    x3 = jnp.zeros((12, 4, 16))       # [layers, d, ff]
    assert param_spec("params/encoder/layers/layer/self_attn/q/kernel", x4) \
        == P(None, None, "model", None)
    x5 = jnp.zeros((12, 16, 3, 4, 4))  # [layers, d, 3, H, Dh]
    assert param_spec("params/encoder/layers/layer/self_attn/qkv/kernel", x5) \
        == P(None, None, None, "model", None)
    assert param_spec("params/encoder/layers/layer/FeedForward_0/Dense_0/kernel", x3) \
        == P(None, None, "model")


def test_scan_layers_tp_grads_match(cfg, batch):
    """DPxTP gradients with the scanned encoder == unsharded scanned."""
    scfg = cfg.replace(model=cfg.model.replace(scan_layers=True))
    state = create_train_state(scfg, jax.random.PRNGKey(0), batch)
    ref_loss, ref_grads = jax.jit(
        lambda p, b: _loss_and_grads(scfg, p, b))(state.params, batch)
    mesh = make_mesh(model_axis_size=2)
    loss, grads = _sharded_grads(scfg, mesh, state, batch)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    _assert_grads_close(ref_grads, grads)
