"""Torch → Flax weight-converter parity tests.

Builds the ACTUAL reference NYUD2 ResNet (``nyud2-dir/models/resnet.py``,
the torchvision layout the reference loads ImageNet weights into at
``train.py:110-114``), randomizes its weights AND BatchNorm running stats,
converts the state_dict with ``tools/convert_torch.py``, and asserts the Flax
forward matches the torch forward in eval mode. Skipped when the reference
checkout or torch is absent."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
torch = pytest.importorskip("torch")

from tools.convert_torch import (  # noqa: E402
    convert_resnet,
    graft_encoder,
    load_converted,
    normalize_state_dict,
    save_converted,
)


@pytest.fixture(scope="module")
def ref_resnet_mod():
    import importlib.util

    path = os.path.join(REF, "nyud2-dir", "models", "resnet.py")
    spec = importlib.util.spec_from_file_location("ref_nyud2_models_resnet", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _randomize(model, seed=0):
    """Random weights + non-trivial BN running stats (the actual conversion
    payload — default zeros/ones would mask mean/var mix-ups)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.Conv2d):
                m.weight.normal_(0, 0.05, generator=g)
            elif isinstance(m, torch.nn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.normal_(0, 0.1, generator=g)
                m.running_mean.normal_(0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
            elif isinstance(m, torch.nn.Linear):
                m.weight.normal_(0, 0.02, generator=g)
                m.bias.zero_()
    model.eval()
    return model


def _flax_forward(converted, stage_sizes, block, x_nchw, n_classes):
    import jax
    import jax.numpy as jnp

    from imbalanced_regression_tpu.models.resnet import (
        RegressionHead,
        ResNetBackbone,
        ResNetBasicBackbone,
    )

    cls = ResNetBackbone if block == "bottleneck" else ResNetBasicBackbone
    backbone = cls(stage_sizes=stage_sizes, dtype=jnp.float32)
    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))  # NCHW -> NHWC
    variables = {"params": converted["params"], "batch_stats": converted["batch_stats"]}
    enc = backbone.apply(variables, x, train=False)
    head = RegressionHead(out_dim=n_classes)
    logits = head.apply({"params": converted["head"]}, enc)
    return np.asarray(enc), np.asarray(logits)


@pytest.mark.parametrize("block_name,stages", [("Bottleneck", (1, 1, 1, 1)),
                                               ("BasicBlock", (1, 1, 1, 1))])
def test_forward_parity_vs_reference_module(ref_resnet_mod, block_name, stages):
    block_cls = getattr(ref_resnet_mod, block_name)
    model = _randomize(ref_resnet_mod.ResNet(block_cls, list(stages), num_classes=10))
    x = torch.randn(2, 3, 224, 224, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        ref_logits = model(x).numpy()

    kind = "bottleneck" if block_name == "Bottleneck" else "basic"
    converted = convert_resnet(model.state_dict(), stage_sizes=stages, block=kind)
    enc, logits = _flax_forward(converted, stages, kind, x.numpy(), n_classes=10)

    # reference pools with AvgPool2d(7) == global mean at 224 input
    np.testing.assert_allclose(logits, ref_logits, rtol=2e-4, atol=2e-4)
    assert enc.shape == (2, 512 * block_cls.expansion)


def test_roundtrip_and_module_prefix(ref_resnet_mod, tmp_path):
    model = _randomize(ref_resnet_mod.ResNet(ref_resnet_mod.Bottleneck, [1, 1, 1, 1]))
    # reference training wraps in DataParallel -> 'module.' prefixed keys
    sd = {f"module.{k}": v for k, v in model.state_dict().items()}
    assert "conv1.weight" in normalize_state_dict(sd)
    converted = convert_resnet(sd, stage_sizes=(1, 1, 1, 1))
    path = str(tmp_path / "enc.msgpack")
    save_converted(path, converted)
    restored = load_converted(path)
    flat_a = sorted(_flatten(converted))
    flat_b = sorted(_flatten(restored))
    assert [k for k, _ in flat_a] == [k for k, _ in flat_b]
    for (_, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(a, b)


def test_wrong_arch_raises(ref_resnet_mod):
    model = _randomize(ref_resnet_mod.ResNet(ref_resnet_mod.Bottleneck, [1, 1, 1, 1]))
    with pytest.raises(KeyError):
        # claiming deeper stages than the state_dict holds
        convert_resnet(model.state_dict(), stage_sizes=(2, 1, 1, 1), block="bottleneck")


def test_graft_into_nyud2_encoder(ref_resnet_mod):
    """End-to-end: converted torch weights land inside DepthEncoderDecoder's
    encoder submodule (the reference's pretrained init path)."""
    import jax

    from imbalanced_regression_tpu.tasks.nyud2 import NYUDConfig, build_nyud_trainer
    from imbalanced_regression_tpu.parallel.mesh import create_mesh

    model = _randomize(ref_resnet_mod.ResNet(ref_resnet_mod.Bottleneck, [1, 1, 1, 1]))
    converted = convert_resnet(model.state_dict(), stage_sizes=(1, 1, 1, 1))

    config = NYUDConfig(stage_sizes=(1, 1, 1, 1), width=64, fds=True)
    trainer = build_nyud_trainer(config, create_mesh(1))
    state = trainer.init_state(jax.random.key(0), np.zeros((1, 64, 64, 3), np.float32))
    new_state = graft_encoder(state, converted, submodule="encoder")

    got = np.asarray(new_state.params["backbone"]["encoder"]["Conv_0"]["kernel"])
    want = model.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    got_bn = np.asarray(new_state.batch_stats["encoder"]["BatchNorm_0"]["mean"])
    np.testing.assert_allclose(got_bn, model.state_dict()["bn1.running_mean"].numpy(),
                               rtol=1e-6)
    # decoder params untouched
    dec_keys = set(new_state.params["backbone"]) - {"encoder"}
    assert dec_keys == set(state.params["backbone"]) - {"encoder"}


def test_graft_shape_mismatch_raises(ref_resnet_mod):
    import jax

    from imbalanced_regression_tpu.models.resnet import RegressionHead, ResNetBasicBackbone
    from imbalanced_regression_tpu.train import Trainer, TrainerConfig

    model = _randomize(ref_resnet_mod.ResNet(ref_resnet_mod.Bottleneck, [1, 1, 1, 1]))
    converted = convert_resnet(model.state_dict(), stage_sizes=(1, 1, 1, 1))
    trainer = Trainer(ResNetBasicBackbone(stage_sizes=(1, 1)), RegressionHead(),
                      TrainerConfig())
    state = trainer.init_state(jax.random.key(0), np.zeros((1, 32, 32, 3), np.float32))
    with pytest.raises(ValueError):
        graft_encoder(state, converted, submodule=None)


def _flatten(tree, prefix=""):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, f"{prefix}{k}/")
        else:
            yield f"{prefix}{k}", np.asarray(v)


@pytest.mark.parametrize("arch", ["resnet101", "resnet152"])
def test_deep_arch_roundtrip_vs_reference_constructor(ref_resnet_mod, arch):
    """The reference's deep constructors (nyud2-dir/models/resnet.py:186-205)
    convert completely: every state_dict tensor is consumed, and the
    converted tree is shape-identical to the Flax backbone the registry
    builds for the same name (structure check via eval_shape — no forward,
    the full-depth 224x224 forward is too heavy for this 1-core host)."""
    import jax
    import jax.numpy as jnp

    from imbalanced_regression_tpu.models import resnet as resnet_mod
    from tools.convert_torch import ARCHS

    kind, stages = ARCHS[arch]
    assert kind == "bottleneck"
    model = getattr(ref_resnet_mod, arch)(pretrained=False)
    sd = model.state_dict()
    converted = convert_resnet(sd, stage_sizes=stages, block=kind)

    # every torch tensor is consumed (fc -> head; BN counters ignored)
    n_torch = sum(1 for k in sd if "num_batches_tracked" not in k)
    n_flax = sum(1 for _ in _flatten(converted))
    assert n_flax == n_torch

    backbone = getattr(resnet_mod, f"{arch}_backbone")(dtype=jnp.float32)
    shapes = jax.eval_shape(
        lambda rng, x: backbone.init(rng, x, train=False), jax.random.key(0),
        jax.ShapeDtypeStruct((1, 224, 224, 3), jnp.float32))
    want = {k: v.shape for k, v in _flatten(
        {"params": jax.tree.map(lambda s: np.zeros(s.shape, np.int8), shapes["params"]),
         "batch_stats": jax.tree.map(lambda s: np.zeros(s.shape, np.int8),
                                     shapes["batch_stats"])})}
    got = {k: v.shape for k, v in _flatten(
        {"params": converted["params"], "batch_stats": converted["batch_stats"]})}
    assert got == want
    # the head carries the torch fc (1000-way for the ImageNet constructors)
    assert converted["head"]["Dense_0"]["kernel"].shape == (512 * 4, 1000)
