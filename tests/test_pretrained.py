"""Pretrained-ingestion converters: layout + numeric parity.

torchvision itself isn't in the image, so the backbone oracle is a hand-built
torch module that mirrors torchvision's ResNet (Bottleneck v1.5: stride on
conv2; downsample = 1x1 conv + BN; eval-mode BN == FrozenBatchNorm math) with
the exact state_dict key layout (conv1/bn1/layerS.B.{convN,bnN,downsample}).
The text oracle is HF's actual RobertaModel (random init, no download).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from torch import nn

from toist_tpu.models.resnet import ResNet
from toist_tpu.utils import pretrained as pre


class _Bottleneck(nn.Module):
    """torchvision.models.resnet.Bottleneck mirror (v1.5 stride placement)."""
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _TorchResNetTrunk(nn.Module):
    """torchvision ResNet trunk mirror with identical state_dict keys."""

    def __init__(self, stage_sizes=(1, 1, 1, 1)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        widths = (64, 128, 256, 512)
        inplanes = 64
        for s, (blocks, w) in enumerate(zip(stage_sizes, widths), start=1):
            layers = []
            for b in range(blocks):
                stride = 1 if (s == 1 or b > 0) else 2
                downsample = None
                if b == 0 and (stride != 1 or inplanes != w * 4):
                    downsample = nn.Sequential(
                        nn.Conv2d(inplanes, w * 4, 1, stride=stride,
                                  bias=False),
                        nn.BatchNorm2d(w * 4))
                layers.append(_Bottleneck(inplanes, w, stride, downsample))
                inplanes = w * 4
            setattr(self, f"layer{s}", nn.Sequential(*layers))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        feats = {}
        for s in range(1, 5):
            x = getattr(self, f"layer{s}")(x)
            feats[f"layer{s}"] = x
        return feats


def _randomize_bn_stats(model, rng):
    """Non-trivial running stats so the FrozenBN folding is actually tested."""
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.as_tensor(
                rng.normal(0, 0.5, m.running_mean.shape[0]).astype(np.float32)))
            m.running_var.copy_(torch.as_tensor(
                rng.uniform(0.5, 1.5, m.running_var.shape[0]).astype(np.float32)))
            m.weight.copy_(torch.as_tensor(
                rng.normal(1, 0.2, m.weight.shape[0]).astype(np.float32)))
            m.bias.copy_(torch.as_tensor(
                rng.normal(0, 0.2, m.bias.shape[0]).astype(np.float32)))


def test_torchvision_resnet_numeric_parity():
    torch.manual_seed(0)
    stage_sizes = (1, 1, 1, 1)
    oracle = _TorchResNetTrunk(stage_sizes).eval()
    with torch.no_grad():
        _randomize_bn_stats(oracle, np.random.default_rng(1))
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    # torchvision state dicts carry fc.* and num_batches_tracked; fake them to
    # prove the converter drops them.
    sd["fc.weight"] = np.zeros((10, 2048), np.float32)
    sd["fc.bias"] = np.zeros((10,), np.float32)
    sd["bn1.num_batches_tracked"] = np.zeros((), np.int64)

    params, frozen = pre.convert_torchvision_resnet(sd, stage_sizes)
    model = ResNet(stage_sizes=stage_sizes, norm_type="frozen_bn")

    x = np.random.default_rng(2).normal(size=(2, 64, 96, 3)).astype(np.float32)
    got = jax.jit(lambda v, x: model.apply(v, x))(
        {"params": params, "frozen": frozen}, jnp.asarray(x))
    with torch.no_grad():
        want = oracle(torch.as_tensor(x.transpose(0, 3, 1, 2)))
    for layer in ("layer1", "layer4"):
        np.testing.assert_allclose(
            np.asarray(got[layer]).transpose(0, 3, 1, 2),
            want[layer].numpy(), atol=2e-4,
            err_msg=f"backbone {layer} mismatch")


def test_torchvision_resnet_layout_matches_init():
    """Converted tree structure equals the model's own init structure."""
    stage_sizes = (1, 1, 1, 1)
    oracle = _TorchResNetTrunk(stage_sizes)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params, frozen = pre.convert_torchvision_resnet(sd, stage_sizes)
    model = ResNet(stage_sizes=stage_sizes, norm_type="frozen_bn")
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 3)))
    pre._check_same_shapes(variables["params"], params)
    pre._check_same_shapes(variables["frozen"], frozen)


def test_hf_roberta_converter_numeric_parity():
    from transformers import RobertaConfig, RobertaModel

    cfg = RobertaConfig(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=36, type_vocab_size=1,
                        layer_norm_eps=1e-5, pad_token_id=1,
                        attn_implementation="eager")
    torch.manual_seed(3)
    oracle = RobertaModel(cfg).eval()  # with pooler: converter must drop it
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    te_params = pre.convert_hf_roberta(sd)
    assert not any("pooler" in k for k in te_params)

    from toist_tpu.models.text_encoder import RobertaEncoder
    m = RobertaEncoder(vocab_size=120, hidden_size=32, num_layers=2,
                       num_heads=4, intermediate_size=64, max_position=36)
    ids = torch.randint(3, 120, (2, 10))
    ids[1, -3:] = 1
    with torch.no_grad():
        want = oracle(input_ids=ids,
                      attention_mask=(ids != 1).long()).last_hidden_state
    got = m.apply({"params": te_params}, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=3e-5)


def test_apply_pretrained_via_files(tmp_path):
    """File-drop path: npz state dicts ingested through Config wiring."""
    from toist_tpu.config import Config, ModelConfig, RunConfig
    from toist_tpu.models.toist import build_model
    from toist_tpu.train.step import init_variables, split_variables
    from tests.test_train_step import synthetic_batch

    stage_sizes = (1, 1, 1, 1)
    oracle = _TorchResNetTrunk(stage_sizes)
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    np.savez(tmp_path / "resnet.npz", **sd)

    cfg = Config(
        model=ModelConfig(backbone="resnet18-test", hidden_dim=64, nheads=4,
                          dim_feedforward=128, enc_layers=1, dec_layers=1,
                          num_queries=10, compute_dtype="float32",
                          contrastive_align_loss=False,
                          backbone_norm="frozen_bn", text_hidden=64,
                          text_layers=1, text_heads=4, text_intermediate=128),
        run=RunConfig(pretrained_backbone=str(tmp_path / "resnet.npz")))
    model = build_model(cfg.model, text_vocab_size=600)
    batch = synthetic_batch(B=1, H=64, W=64, N=2, T=12)
    params, frozen = split_variables(init_variables(model, batch, seed=0))

    from toist_tpu.utils.pretrained import apply_pretrained
    new_params, new_frozen = apply_pretrained(cfg, params, frozen)
    np.testing.assert_allclose(
        np.asarray(new_params["backbone"]["conv1"]["kernel"]),
        sd["conv1.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(new_frozen["frozen"]["backbone"]["FrozenBN_0"]["running_mean"]),
        sd["bn1.running_mean"])
    # without_pretrain short-circuits ingestion (reference main.py:256).
    import dataclasses
    cfg2 = cfg.replace(
        model=dataclasses.replace(cfg.model, without_pretrain=True))
    p2, _ = apply_pretrained(cfg2, params, frozen)
    assert p2 is params
