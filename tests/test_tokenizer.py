"""CLIP BPE tokenizer: parity vs transformers.CLIPTokenizer on shared vocab
files, plus padding/truncation/round-trip behavior.

The reference consumes the HF tokenizer from the SD checkpoint
(/root/reference/gaussctrl/ad_pipeline.py:101-108); these tests pin our
from-scratch implementation to the same algorithm without network access by
generating a structurally-real miniature vocab and loading BOTH tokenizers
from the same files.
"""

import json

import numpy as np
import pytest

from gaussctrl_exp_tpu.diffusion.tokenizer import (
    BOS,
    EOS,
    CLIPTokenizer,
    bytes_to_unicode,
    make_test_vocab,
)

# contraction-free prompts: HF without ftfy routes through BasicTokenizer,
# which only diverges from the ftfy path on apostrophe contractions
PROMPTS = [
    "a photo of a bear statue in a forest",
    "a photo of a polar bear in the forest",  # scripts/bear.sh prompt
    "turn him into a clown",
    "the stone horse, 4k",
    "  Weird   WHITESPACE\tand CAPS  ",
    "unicode café — dash",
    "",
]


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    vocab, merges = make_test_vocab()
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(" ".join(m) for m in merges) + "\n"
    )
    return d


@pytest.fixture(scope="module")
def ours(vocab_dir):
    return CLIPTokenizer.from_files(vocab_dir / "vocab.json", vocab_dir / "merges.txt")


@pytest.fixture(scope="module")
def hf(vocab_dir):
    from transformers import CLIPTokenizer as HFTok

    return HFTok(str(vocab_dir / "vocab.json"), str(vocab_dir / "merges.txt"))


def test_parity_vs_transformers(ours, hf):
    for p in PROMPTS:
        ref = hf(p, padding="max_length", max_length=77, truncation=True).input_ids
        got = ours([p])[0].tolist()
        assert got == ref, (p, got[:16], ref[:16])


def test_parity_unpadded(ours, hf):
    for p in PROMPTS:
        ref = hf(p).input_ids
        got = [ours.bos_id] + ours.encode(p) + [ours.eos_id]
        assert got == ref, p


def test_merges_applied(ours):
    # "the" must merge t+h → th, th+e</w> → the</w> (single token)
    ids = ours.encode("the")
    assert len(ids) == 1
    assert ours.decoder[ids[0]] == "the</w>"
    # "bear" merges to bear</w> via b+e, be+a, bea+r</w>
    ids = ours.encode("bear")
    assert len(ids) == 1 and ours.decoder[ids[0]] == "bear</w>"


def test_padding_and_truncation(ours):
    out = ours(["the bear", "x" * 500], max_len=16)
    assert out.shape == (2, 16) and out.dtype == np.int32
    assert out[0, 0] == ours.bos_id
    assert ours.eos_id in out[0].tolist()
    # everything after eos is pad (= eos id)
    first_eos = out[0].tolist().index(ours.eos_id)
    assert all(v == ours.pad_id for v in out[0, first_eos:].tolist())
    # long input truncated to max_len with terminal eos
    assert out[1, -1] == ours.eos_id and out[1, 0] == ours.bos_id


def test_roundtrip_decode(ours):
    s = "the bear and the stone"
    assert ours.decode(ours.encode(s)) == s


def test_byte_table_is_bijective():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256


def test_from_pretrained_layouts(tmp_path, ours):
    vocab, merges = make_test_vocab()
    sub = tmp_path / "ckpt" / "tokenizer"
    sub.mkdir(parents=True)
    (sub / "vocab.json").write_text(json.dumps(vocab))
    (sub / "merges.txt").write_text("\n".join(" ".join(m) for m in merges))
    for root in (tmp_path / "ckpt", sub):
        t = CLIPTokenizer.from_pretrained(root)
        assert t.encode("the") == ours.encode("the")
    with pytest.raises(FileNotFoundError):
        CLIPTokenizer.from_pretrained(tmp_path / "nothing")


def test_specials_survive(ours):
    ids = ours.encode(f"{BOS} the {EOS}")
    assert ours.encoder[BOS] in ids and ours.encoder[EOS] in ids
