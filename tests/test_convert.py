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
