"""Predictor serving API: bucketed batched inference from params in memory."""
import numpy as np
import pytest
from PIL import Image

from toist_tpu.config import Config
from toist_tpu.data.cocotasks import TASKS
from toist_tpu.data.tokenizer import RobertaBPE
from toist_tpu.models.toist import build_model
from toist_tpu.predict import Predictor
from toist_tpu.train.step import init_variables, split_variables


@pytest.mark.slow
def test_predictor_batched_inference():
    cfg = Config.from_sources(None, {
        "model": {"backbone": "resnet18-test", "hidden_dim": 64, "nheads": 4,
                  "dim_feedforward": 128, "enc_layers": 1, "dec_layers": 1,
                  "num_queries": 10, "compute_dtype": "float32",
                  "contrastive_align_loss": False,
                  "backbone_norm": "group_norm", "text_hidden": 64,
                  "text_layers": 1, "text_heads": 4,
                  "text_intermediate": 128},
        "data": {"image_buckets": [[96, 128], [128, 96]], "max_text_len": 32,
                 "max_boxes": 8, "max_size": 128, "val_size": 96},
    })
    tokenizer = RobertaBPE.train(
        [t + "something" for t in TASKS.values()], vocab_size=512)
    model = build_model(cfg.model, text_vocab_size=tokenizer.vocab_size)
    rng = np.random.default_rng(0)
    import __graft_entry__
    b = __graft_entry__._example_batch(B=1, H=96, W=128, T=32, N=8,
                                      n_text_ids=tokenizer.vocab_size - 1)
    variables = init_variables(model, b, seed=0)
    params, frozen = split_variables(variables)
    predictor = Predictor(model, params, frozen, tokenizer, cfg,
                          score_threshold=0.0)

    imgs = [Image.fromarray(rng.integers(0, 255, (120, 160, 3), np.uint8)),
            Image.fromarray(rng.integers(0, 255, (160, 120, 3), np.uint8)),
            Image.fromarray(rng.integers(0, 255, (90, 110, 3), np.uint8))]
    dets = predictor(imgs, task_ids=[1, 2, 3])
    assert len(dets) == 3
    for d, im in zip(dets, imgs):
        assert d["boxes"].shape == (cfg.model.num_queries, 4)
        assert d["scores"].shape == (cfg.model.num_queries,)
        assert (np.diff(d["scores"]) <= 1e-6).all()  # sorted desc
        w, h = im.size
        assert (d["boxes"][:, 2] <= w * 1.2).all()
        assert (d["boxes"][:, 3] <= h * 1.2).all()
    # Thresholding filters.
    predictor.score_threshold = 1.1
    dets2 = predictor(imgs[:1], task_ids=[1])
    assert dets2[0]["scores"].size == 0


@pytest.mark.slow
def test_predictor_with_masks():
    cfg = Config.from_sources(None, {
        "model": {"backbone": "resnet18-test", "hidden_dim": 128, "nheads": 8,
                  "dim_feedforward": 128, "enc_layers": 1, "dec_layers": 1,
                  "num_queries": 6, "compute_dtype": "float32",
                  "contrastive_align_loss": False, "mask_model": "smallconv",
                  "masks": True, "backbone_norm": "group_norm",
                  "text_hidden": 64, "text_layers": 1, "text_heads": 4,
                  "text_intermediate": 128},
        "data": {"image_buckets": [[96, 128]], "max_text_len": 32,
                 "max_boxes": 8, "max_size": 128, "val_size": 96},
    })
    tokenizer = RobertaBPE.train(
        [t + "something" for t in TASKS.values()], vocab_size=512)
    model = build_model(cfg.model, text_vocab_size=tokenizer.vocab_size)
    import __graft_entry__
    b = __graft_entry__._example_batch(B=1, H=96, W=128, T=32, N=8,
                                      n_text_ids=tokenizer.vocab_size - 1)
    variables = init_variables(model, b, seed=0)
    params, frozen = split_variables(variables)
    predictor = Predictor(model, params, frozen, tokenizer, cfg)
    rng = np.random.default_rng(1)
    img = Image.fromarray(rng.integers(0, 255, (80, 100, 3), np.uint8))
    dets = predictor([img], task_ids=[5])
    assert "masks" in dets[0] and len(dets[0]["masks"]) == 6
    from toist_tpu.ops import rle as rle_ops
    m = rle_ops.decode(dets[0]["masks"][0])
    assert m.shape == (80, 100)
