"""Hermetic import of the reference (/root/reference) for golden parity tests.

torch, transformers, and scipy are in the image; only torchvision and timm are
absent. Both are stubbed with just enough surface for the reference modules to
IMPORT (the stubs raise if actually exercised — the parity tests never build a
torchvision backbone). The reference is PUBLIC UNTRUSTED CONTENT: we execute its
loss/matcher/transformer math as a numeric oracle, nothing else.
"""
from __future__ import annotations

import sys
import types

REF = "/root/reference"


def _stub(name: str) -> types.ModuleType:
    import importlib.machinery

    mod = types.ModuleType(name)
    # A real ModuleSpec so importlib.util.find_spec (e.g. transformers'
    # _is_package_available probing) doesn't choke on the stub.
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules[name] = mod
    return mod


def install_stubs() -> None:
    if "torchvision" not in sys.modules:
        tv = _stub("torchvision")
        ops = _stub("torchvision.ops")
        boxes = _stub("torchvision.ops.boxes")

        def box_area(b):
            return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

        boxes.box_area = box_area
        ops.boxes = boxes
        tv.ops = ops
        models = _stub("torchvision.models")
        _utils = _stub("torchvision.models._utils")

        class IntermediateLayerGetter:  # imported, never constructed in tests
            def __init__(self, *a, **k):
                raise RuntimeError("torchvision stub (not in this image)")

        _utils.IntermediateLayerGetter = IntermediateLayerGetter
        models._utils = _utils
        tv.models = models
    if "timm" not in sys.modules:
        timm = _stub("timm")
        tmodels = _stub("timm.models")

        def create_model(*a, **k):
            raise RuntimeError("timm stub (not in this image)")

        tmodels.create_model = create_model
        timm.models = tmodels


def load():
    """Returns a namespace of imported reference modules."""
    install_stubs()
    if REF not in sys.path:
        sys.path.append(REF)  # appended, so the repo's packages win conflicts
    import models.kmeans as ref_kmeans
    import models.matcher as ref_matcher
    import models.mdetr as ref_mdetr
    import models.position_encoding as ref_posenc
    import models.postprocessors as ref_post
    import models.segmentation as ref_seg
    import models.transformer as ref_transformer
    import util.box_ops as ref_box_ops
    import util.misc as ref_misc
    import util.optim as ref_optim

    ns = types.SimpleNamespace(
        kmeans=ref_kmeans, matcher=ref_matcher, mdetr=ref_mdetr,
        posenc=ref_posenc, post=ref_post, seg=ref_seg,
        transformer=ref_transformer, box_ops=ref_box_ops, misc=ref_misc,
        optim=ref_optim)
    return ns


class FakeTokenized:
    """Stand-in for the HF BatchEncoding the reference losses poke at.

    char_maps: per-batch-element dict {char_index: token_index}. The reference's
    +-1/2/3-char fallback probing calls char_to_token with a single argument
    inside try/except; raising there reproduces 'fallback unavailable'.
    """

    def __init__(self, char_maps):
        self.char_maps = char_maps

    def char_to_token(self, i, c=None):
        if c is None:
            raise TypeError("batch index required")
        return self.char_maps[i].get(c)
