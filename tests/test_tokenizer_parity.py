"""Tokenizer parity vs HuggingFace's actual byte-level BPE implementation.

RobertaBPE.save round-trips into transformers' RobertaTokenizerFast (the Rust
`tokenizers` wheel is in the image — no network, no pretrained download), which
is the very code the reference runs (models/transformer.py:59). Asserted on all
14 TASKS captions x noun phrases AND non-ASCII text: token ids, char offsets,
and char_to_token — the offsets feed the whole positive-map/distillation
machinery (datasets/tdod.py:150-176).
"""
import numpy as np
import pytest

pytest.importorskip("transformers")
pytest.importorskip("tokenizers")

from toist_tpu.data.cocotasks import TASKS
from toist_tpu.data.tokenizer import RobertaBPE

NOUNS = ["chair", "knife", "vase", "stick", "cup", "spoon", "shovel",
         "bottle opener", "scissors", "wine glass", "fork", "skateboard",
         "fire hydrant", "baseball bat"]

UNICODE_TEXTS = [
    "pour café with crème brûlée",
    "open bottle of Bier with Flaschenöffner",
    "dig hole with   shovel",     # NBSP
    "use 北京 chopsticks with 茶",
    "price 3.14€ isn't £42",
    "naïve señor's piñata",
]


@pytest.fixture(scope="module")
def bpe(tmp_path_factory):
    corpus = [t + "something" for t in TASKS.values()]
    corpus += [t + n for t in TASKS.values() for n in NOUNS]
    corpus += UNICODE_TEXTS
    return RobertaBPE.train(corpus, vocab_size=800)


@pytest.fixture(scope="module")
def hf(bpe, tmp_path_factory):
    from transformers import RobertaTokenizerFast

    d = tmp_path_factory.mktemp("bpe_files")
    vocab, merges = str(d / "vocab.json"), str(d / "merges.txt")
    bpe.save(vocab, merges)
    return RobertaTokenizerFast(vocab_file=vocab, merges_file=merges)


def all_captions():
    caps = [t + "something" for t in TASKS.values()]
    caps += [t + n for t in TASKS.values() for n in NOUNS]
    # multi-noun teacher captions (space-joined phrases, tdod.py:66-79)
    caps += [TASKS[1] + NOUNS[0] + " " + TASKS[1] + NOUNS[1]]
    return caps


def _assert_parity(bpe, hf, text):
    enc_hf = hf(text, return_offsets_mapping=True)
    got = bpe.encode(text)
    assert got.input_ids == enc_hf["input_ids"], text
    # Offsets: HF reports (0, 0) for specials; ours excludes them.
    hf_offsets = enc_hf["offset_mapping"][1:-1]
    assert list(zip(got.starts, got.ends)) == [tuple(o) for o in hf_offsets], \
        text


@pytest.mark.parametrize("idx", range(0, 14))
def test_caption_parity(bpe, hf, idx):
    t = TASKS[idx + 1]
    for text in [t + "something"] + [t + n for n in NOUNS]:
        _assert_parity(bpe, hf, text)


def test_multi_phrase_and_edge_captions(bpe, hf):
    for text in all_captions()[-1:] + ["  double  spaces ", "tab\tsep",
                                       "trail space ", " lead", "a", ""]:
        if not text:
            continue
        _assert_parity(bpe, hf, text)


@pytest.mark.parametrize("text", UNICODE_TEXTS)
def test_unicode_parity(bpe, hf, text):
    _assert_parity(bpe, hf, text)


def test_char_to_token_matches_hf(bpe, hf):
    """char_to_token drives positive maps; must agree char-by-char."""
    from transformers import RobertaTokenizerFast

    for text in all_captions()[:30] + UNICODE_TEXTS:
        enc_hf = hf(text)
        got = bpe.encode(text)
        for c in range(len(text)):
            assert got.char_to_token(c) == enc_hf.char_to_token(c), \
                (text, c, text[c])


def test_unseen_bytes_do_not_crash(bpe):
    out = bpe.encode("emoji 🔥 and ß")
    assert len(out.input_ids) >= 3
    assert all(i >= 0 for i in out.input_ids)
