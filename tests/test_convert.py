"""Weight-converter tests: torch ResNet -> flax, with numerical forward
parity against a torch oracle implementation of torchvision's ResNet-18
feature trunk (torchvision itself is not installed; the oracle reimplements
its exact module graph and key names)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rtda_semanticsegmentation_tpu.models.convert import (  # noqa: E402
    convert_torch_checkpoint,
    load_npz_into_variables,
    strip_key_prefix,
)
from rtda_semanticsegmentation_tpu.models.resnet import ContextPath  # noqa: E402


class TorchBasicBlock(tnn.Module):
    """torchvision BasicBlock (key names conv1/bn1/conv2/bn2/downsample)."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idt)


class TorchResNet18Features(tnn.Module):
    """torchvision resnet18 trunk with identical state_dict key names."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        chans = (64, 128, 256, 512)
        cin = 64
        for s, cout in enumerate(chans, start=1):
            stride = 1 if s == 1 else 2
            blocks = [TorchBasicBlock(cin, cout, stride), TorchBasicBlock(cout, cout)]
            setattr(self, f"layer{s}", tnn.Sequential(*blocks))
            cin = cout

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        c3 = self.layer3(x)
        c4 = self.layer4(c3)
        return c3, c4


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    torch.manual_seed(0)
    net = TorchResNet18Features().eval()
    # randomize BN stats so parity actually exercises them
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    state = {k: v.numpy() for k, v in net.state_dict().items()}
    arrays = convert_torch_checkpoint(state, "bisenet", 18)
    path = tmp_path_factory.mktemp("w") / "r18.npz"
    np.savez(path, **arrays)
    return net, str(path)


def test_convert_produces_expected_key_count(converted):
    _, path = converted
    arrays = np.load(path)
    # stem conv + 16 block convs + 3 downsample convs = 20 kernels;
    # each of 20 BNs contributes scale+bias+mean+var = 80; total 100.
    assert len(arrays.files) == 100
    assert "params/context_path/resnet/stem/conv/kernel" in arrays.files
    assert "batch_stats/context_path/resnet/layer4_0/downsample/bn/var" in arrays.files


def test_forward_parity_with_torch(converted):
    net, path = converted
    model = ContextPath(depth=18, dtype=jnp.float32)
    x = np.random.RandomState(0).rand(1, 64, 96, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    # Wrap in the bisenet-rooted structure the converter targets.
    wrapped = {
        "params": {"context_path": variables["params"]},
        "batch_stats": {"context_path": variables["batch_stats"]},
    }
    wrapped = load_npz_into_variables(wrapped, path, "bisenet")
    variables = {
        "params": wrapped["params"]["context_path"],
        "batch_stats": wrapped["batch_stats"]["context_path"],
    }
    c3, c4, tail = model.apply(variables, jnp.asarray(x), False)

    with torch.no_grad():
        t3, t4 = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(c3), t3.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(c4), t4.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(tail)[:, 0, 0, :],
        t4.mean(dim=(2, 3)).numpy(),
        rtol=1e-4,
        atol=1e-4,
    )


def test_strip_prefix_and_unknown_key_raises(converted, tmp_path):
    net, _ = converted
    # caffe-style prefixed keys (reference deeplabv2.py:181-186)
    state = {f"Scale.{k}": v.numpy() for k, v in net.state_dict().items()}
    stripped = strip_key_prefix(state)
    assert "conv1.weight" in stripped
    arrays = convert_torch_checkpoint(state, "bisenet", 18)
    assert "params/context_path/resnet/stem/conv/kernel" in arrays

    bad = tmp_path / "bad.npz"
    np.savez(bad, **{"params/nonexistent/kernel": np.zeros((1, 1, 1, 1))})
    with pytest.raises(KeyError):
        load_npz_into_variables(
            {"params": {"x": np.zeros(1)}}, str(bad), "bisenet"
        )


def test_pretrained_backbone_e2e_into_bisenet(converted, tmp_path):
    """The full --pretrained_backbone flow: converted npz grafted into a
    freshly-initialized BiSeNet via the factory hook."""
    from rtda_semanticsegmentation_tpu.config import ModelConfig
    from rtda_semanticsegmentation_tpu.models.factory import (
        build_model,
        init_model,
        load_pretrained_backbone,
    )

    net, path = converted
    cfg = ModelConfig(compute_dtype="float32")
    model = build_model(cfg)
    variables = init_model(model, jax.random.PRNGKey(0), (1, 64, 64, 3))
    loaded = load_pretrained_backbone(variables, path, "bisenet")
    stem_t = net.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["context_path"]["resnet"]["stem"]["conv"]["kernel"]),
        stem_t,
    )
    # non-backbone params untouched
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["spatial_path"]["convblock1"]["conv"]["kernel"]),
        np.asarray(variables["params"]["spatial_path"]["convblock1"]["conv"]["kernel"]),
    )
    # model still runs with grafted weights
    out = model.apply(loaded, jnp.zeros((1, 64, 64, 3)), False)
    assert out.shape == (1, 64, 64, 19)


# ---------------------------------------------------------------------------
# Full reference-checkpoint conversion (convert_full_torch_checkpoint)
# ---------------------------------------------------------------------------
# Torch mirrors of the reference modules with the reference's exact
# state_dict key names (build_bisenet.py:8-117 incl. the load-bearing
# 'saptial_path' typo; build_contextpath.py:8-29) — test fixtures only.


class TorchConvBlock(tnn.Module):
    """Reference ConvBlock: conv(bias=True) -> bn -> relu (build_bisenet.py:8-18)."""

    def __init__(self, cin, cout, stride=2):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=True)
        self.bn = tnn.BatchNorm2d(cout)
        self.relu = tnn.ReLU()

    def forward(self, x):
        return self.relu(self.bn(self.conv1(x)))


class TorchSpatialPath(tnn.Module):
    def __init__(self):
        super().__init__()
        self.convblock1 = TorchConvBlock(3, 64)
        self.convblock2 = TorchConvBlock(64, 128)
        self.convblock3 = TorchConvBlock(128, 256)

    def forward(self, x):
        return self.convblock3(self.convblock2(self.convblock1(x)))


class TorchARM(tnn.Module):
    """Reference AttentionRefinementModule (build_bisenet.py:35-53)."""

    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 1)
        self.bn = tnn.BatchNorm2d(ch)
        self.sigmoid = tnn.Sigmoid()
        self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))

    def forward(self, x):
        g = self.sigmoid(self.bn(self.conv(self.avgpool(x))))
        return torch.mul(x, g)


class TorchFFM(tnn.Module):
    """Reference FeatureFusionModule (build_bisenet.py:56-81)."""

    def __init__(self, num_classes, cin):
        super().__init__()
        self.convblock = TorchConvBlock(cin, num_classes, stride=1)
        self.conv1 = tnn.Conv2d(num_classes, num_classes, 1)
        self.relu = tnn.ReLU()
        self.conv2 = tnn.Conv2d(num_classes, num_classes, 1)
        self.sigmoid = tnn.Sigmoid()
        self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))

    def forward(self, a, b):
        feature = self.convblock(torch.cat((a, b), 1))
        g = self.avgpool(feature)
        g = self.sigmoid(self.conv2(self.relu(self.conv1(g))))
        return torch.add(torch.mul(feature, g), feature)


class TorchContextPath(tnn.Module):
    """Reference resnet18 context path (build_contextpath.py:5-29):
    the trunk lives under the 'features' attribute."""

    def __init__(self):
        super().__init__()
        self.features = TorchResNet18Features()

    def forward(self, x):
        c3, c4 = self.features(x)
        tail = torch.mean(torch.mean(c4, 3, keepdim=True), 2, keepdim=True)
        return c3, c4, tail


class TorchBiSeNet(tnn.Module):
    """Reference BiSeNet eval forward (build_bisenet.py:85-170), r18."""

    def __init__(self, num_classes=19):
        super().__init__()
        self.saptial_path = TorchSpatialPath()
        self.context_path = TorchContextPath()
        self.attention_refinement_module1 = TorchARM(256)
        self.attention_refinement_module2 = TorchARM(512)
        self.supervision1 = tnn.Conv2d(256, num_classes, 1)
        self.supervision2 = tnn.Conv2d(512, num_classes, 1)
        self.feature_fusion_module = TorchFFM(num_classes, 1024)
        self.conv = tnn.Conv2d(num_classes, num_classes, 1)

    def forward(self, x):
        sx = self.saptial_path(x)
        cx1, cx2, tail = self.context_path(x)
        cx1 = self.attention_refinement_module1(cx1)
        cx2 = self.attention_refinement_module2(cx2)
        cx2 = torch.mul(cx2, tail)
        size = sx.size()[-2:]
        cx1 = torch.nn.functional.interpolate(cx1, size=size, mode="bilinear")
        cx2 = torch.nn.functional.interpolate(cx2, size=size, mode="bilinear")
        cx = torch.cat((cx1, cx2), 1)
        result = self.feature_fusion_module(sx, cx)
        result = torch.nn.functional.interpolate(
            result, scale_factor=8, mode="bilinear"
        )
        return self.conv(result)


@pytest.fixture(scope="module")
def full_bisenet_npz(tmp_path_factory):
    from rtda_semanticsegmentation_tpu.models.convert import (
        convert_full_torch_checkpoint,
    )

    torch.manual_seed(1)
    net = TorchBiSeNet().eval()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    state = {k: v.numpy() for k, v in net.state_dict().items()}
    arrays = convert_full_torch_checkpoint(state, "bisenet", 18)
    path = tmp_path_factory.mktemp("full") / "bisenet_full.npz"
    np.savez(path, **arrays)
    return net, str(path)


def test_full_conversion_forward_parity(full_bisenet_npz):
    """Converted reference-trained BiSeNet == torch eval forward (the whole
    model: spatial path + ARMs + FFM + heads + trunk, incl. the conv-bias
    -> BN-mean fold for the bias-free ConvBN units)."""
    from rtda_semanticsegmentation_tpu.config import ModelConfig
    from rtda_semanticsegmentation_tpu.models.convert import (
        load_npz_into_variables,
    )
    from rtda_semanticsegmentation_tpu.models.factory import (
        build_model,
        init_model,
    )

    net, path = full_bisenet_npz
    model = build_model(
        ModelConfig(name="bisenet", context_path="resnet18",
                    compute_dtype="float32")
    )
    variables = init_model(model, jax.random.PRNGKey(0), (1, 64, 128, 3),
                           train=False)
    variables = load_npz_into_variables(variables, path, "bisenet")

    rng = np.random.RandomState(0)
    x = rng.rand(1, 64, 128, 3).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x), False))
    with torch.no_grad():
        ref = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_full_conversion_warm_start_tree(full_bisenet_npz):
    """Train-mode graft consumes the supervision heads too (warm-start)."""
    from rtda_semanticsegmentation_tpu.config import ModelConfig
    from rtda_semanticsegmentation_tpu.models.convert import (
        load_npz_into_variables,
    )
    from rtda_semanticsegmentation_tpu.models.factory import (
        build_model,
        init_model,
    )

    net, path = full_bisenet_npz
    model = build_model(
        ModelConfig(name="bisenet", context_path="resnet18",
                    compute_dtype="float32")
    )
    variables = init_model(model, jax.random.PRNGKey(0), (1, 64, 128, 3),
                           train=True)
    grafted = load_npz_into_variables(variables, path, "bisenet")
    sup = np.asarray(grafted["params"]["supervision1"]["kernel"])
    want = net.supervision1.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(sup, want, rtol=1e-6)


def test_full_conversion_deeplab_aspp_mapping():
    from rtda_semanticsegmentation_tpu.models.convert import (
        convert_full_torch_checkpoint,
    )

    rng = np.random.RandomState(2)
    state = {}
    for i in range(4):
        state[f"layer6.conv2d_list.{i}.weight"] = rng.randn(
            19, 2048, 3, 3
        ).astype(np.float32)
        state[f"layer6.conv2d_list.{i}.bias"] = rng.randn(19).astype(
            np.float32
        )
    arrays = convert_full_torch_checkpoint(state, "deeplabv2", 101)
    for i in range(4):
        k = arrays[f"params/aspp/branch{i}/kernel"]
        assert k.shape == (3, 3, 2048, 19)
        np.testing.assert_allclose(
            k, state[f"layer6.conv2d_list.{i}.weight"].transpose(2, 3, 1, 0)
        )


def test_unwrap_reference_checkpoint_containers():
    from rtda_semanticsegmentation_tpu.models.convert import (
        unwrap_reference_checkpoint,
    )

    sd = {"conv.weight": np.zeros(1)}
    assert unwrap_reference_checkpoint({"model_state_dict": sd}) is sd
    assert unwrap_reference_checkpoint(
        {"model_G_state_dict": sd, "model_D_state_dict": {}}
    ) is sd
    assert unwrap_reference_checkpoint(sd) is sd
    # Asking for the discriminator out of a vanilla container is a clear
    # error, not a downstream KeyError.
    with pytest.raises(ValueError, match="not an adversarial checkpoint"):
        unwrap_reference_checkpoint({"model_state_dict": sd}, which="D")
    # A bare discriminator state_dict still passes through.
    assert unwrap_reference_checkpoint(sd, which="D") is sd


def test_convert_cli_rejects_depth_for_discriminator(tmp_path):
    from rtda_semanticsegmentation_tpu.cli import convert_torch_weights

    with pytest.raises(SystemExit):
        convert_torch_weights.main([
            "--torch_checkpoint", str(tmp_path / "x.pth"),
            "--model", "discriminator", "--depth", "18",
            "--output", str(tmp_path / "o.npz"),
        ])


class TorchFCDiscriminator(tnn.Module):
    """Reference FCDiscriminator key names + eval forward
    (discriminator.py:25-60)."""

    def __init__(self, num_classes=19, ndf=64):
        super().__init__()
        self.conv1 = tnn.Conv2d(num_classes, ndf, 4, 2, 1)
        self.conv2 = tnn.Conv2d(ndf, ndf * 2, 4, 2, 1)
        self.conv3 = tnn.Conv2d(ndf * 2, ndf * 4, 4, 2, 1)
        self.conv4 = tnn.Conv2d(ndf * 4, ndf * 8, 4, 2, 1)
        self.classifier = tnn.Conv2d(ndf * 8, 1, 4, 2, 1)
        self.act = tnn.LeakyReLU(0.2)

    def forward(self, x):
        for conv in (self.conv1, self.conv2, self.conv3, self.conv4):
            x = self.act(conv(x))
        return self.classifier(x)


def test_discriminator_conversion_forward_parity(tmp_path):
    from rtda_semanticsegmentation_tpu.config import ModelConfig
    from rtda_semanticsegmentation_tpu.models.convert import (
        convert_full_torch_checkpoint,
        load_npz_into_variables,
        unwrap_reference_checkpoint,
    )
    from rtda_semanticsegmentation_tpu.models.factory import (
        build_discriminator,
        init_model,
    )

    torch.manual_seed(3)
    net = TorchFCDiscriminator().eval()
    container = {
        "model_G_state_dict": {},
        "model_D_state_dict": {k: v.numpy() for k, v in net.state_dict().items()},
    }
    state = unwrap_reference_checkpoint(container, which="D")
    arrays = convert_full_torch_checkpoint(state, "discriminator", 18)
    path = str(tmp_path / "d.npz")
    np.savez(path, **arrays)

    disc = build_discriminator(
        ModelConfig(name="bisenet", compute_dtype="float32")
    )
    d_vars = init_model(disc, jax.random.PRNGKey(0), (1, 64, 64, 19))
    d_vars = load_npz_into_variables(d_vars, path, "discriminator")

    rng = np.random.RandomState(1)
    x = rng.rand(2, 64, 64, 19).astype(np.float32)
    ours = np.asarray(disc.apply(d_vars, jnp.asarray(x)))
    with torch.no_grad():
        ref = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)
