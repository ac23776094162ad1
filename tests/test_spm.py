"""Pure-Python SentencePiece engine (utils/spm.py) and the real tokenizer
path in models/text.py (reference: pocket_tts_mlx/conditioners/text.py:15-29).

The fixture is a tiny unigram model built with the in-repo proto writer, so
the SentencePieceTokenizer branch — vocab-size assert, encode, decode, the
`.!...?` end-of-sentence derivation (reference: tts_model.py:527) — executes
offline, without the native `sentencepiece` dependency.
"""

import math

import numpy as np
import pytest

from pocket_tts_tpu.utils.spm import (
    BYTE,
    CONTROL,
    NORMAL,
    UNKNOWN,
    SentencePieceProcessor,
    build_model_proto,
    parse_model_proto,
)


def _fixture_pieces():
    pieces = [
        ("<unk>", 0.0, UNKNOWN),
        ("<s>", 0.0, CONTROL),
        ("</s>", 0.0, CONTROL),
        ("▁", -2.0, NORMAL),        # "▁"
        (".", -1.5, NORMAL),
        ("!", -2.5, NORMAL),
        ("?", -2.5, NORMAL),
        ("...", -3.0, NORMAL),
        ("▁hello", -3.0, NORMAL),
        ("▁world", -3.2, NORMAL),
        ("▁the", -2.2, NORMAL),
        ("hell", -5.0, NORMAL),
        ("o", -4.0, NORMAL),
        ("lo", -4.5, NORMAL),
    ]
    # single letters so arbitrary ASCII words tokenize without <unk>
    for c in "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ":
        pieces.append((c, -8.0, NORMAL))
    return pieces


@pytest.fixture(scope="module")
def model_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("spm") / "tokenizer.model"
    path.write_bytes(build_model_proto(_fixture_pieces()))
    return path


def test_proto_roundtrip(model_file):
    m = parse_model_proto(model_file.read_bytes())
    assert m.pieces[0] == "<unk>" and m.types[0] == UNKNOWN
    assert m.pieces[4] == "." and math.isclose(m.scores[4], -1.5, rel_tol=1e-6)
    assert m.model_type == 1 and m.unk_id == 0 and m.add_dummy_prefix


def test_viterbi_prefers_whole_words(model_file):
    sp = SentencePieceProcessor(str(model_file))
    assert sp.vocab_size() == len(_fixture_pieces())
    # "hello world." -> ▁hello ▁world .   (whole-word pieces beat letters)
    pieces = sp.encode_as_pieces("hello world.")
    assert pieces == ["▁hello", "▁world", "."]
    ids = sp.encode("hello world.")
    assert ids == [sp.piece_to_id(p) for p in pieces]


def test_viterbi_falls_back_to_letters_and_unk(model_file):
    sp = SentencePieceProcessor(str(model_file))
    pieces = sp.encode_as_pieces("the zebra")
    assert pieces[0] == "▁the"
    assert pieces[1] == "▁"           # dummy-prefix space before unknown word
    assert "z" in pieces and "e" in pieces  # spelled out letter by letter
    # A character with no piece at all -> unk id
    ids = sp.encode("hello Ω")
    assert sp._m.unk_id in ids


def test_normalization_rules(model_file):
    sp = SentencePieceProcessor(str(model_file))
    # extra whitespace collapses; dummy prefix is added once
    assert sp.encode("hello   world.") == sp.encode("hello world.")
    assert sp.encode(" hello world. ") == sp.encode("hello world.")


def test_decode_inverts_encode(model_file):
    sp = SentencePieceProcessor(str(model_file))
    for text in ("hello world.", "the quick fox...", "who? me!"):
        assert sp.decode(sp.encode(text)) == text


def test_bpe_model_rejected(tmp_path):
    path = tmp_path / "bpe.model"
    path.write_bytes(build_model_proto(_fixture_pieces(), model_type=2))
    with pytest.raises(ValueError, match="unigram"):
        SentencePieceProcessor(str(path))


def test_byte_fallback(tmp_path):
    pieces = _fixture_pieces() + [(f"<0x{b:02X}>", -10.0, BYTE) for b in range(256)]
    path = tmp_path / "bytes.model"
    path.write_bytes(build_model_proto(pieces))
    sp = SentencePieceProcessor(str(path))
    ids = sp.encode("hello Ω")
    assert sp._m.unk_id not in ids
    assert sp.decode(ids) == "hello Ω"


# ---------------------------------------------------------------- text.py path

def test_sentencepiece_tokenizer_branch(model_file):
    """models/text.py's real tokenizer branch (not the hash fallback)."""
    from pocket_tts_tpu.models.text import SentencePieceTokenizer, make_tokenizer

    n = len(_fixture_pieces())
    tok = SentencePieceTokenizer(n, str(model_file))
    ids = tok.encode("hello world.")
    assert ids and all(isinstance(i, int) for i in ids)
    assert tok.decode(ids) == "hello world."
    out = tok("hello world.")
    assert out.tokens.shape == (1, len(ids)) and out.tokens.dtype == np.int32

    # End-of-sentence ids: ".!...?" minus the leading whitespace marker
    # (reference: pocket_tts_mlx/models/tts_model.py:527).
    eos = tok.end_of_sentence_tokens()
    assert tok.sp.piece_to_id(".") in eos
    assert tok.sp.piece_to_id("?") in eos
    assert tok.sp.piece_to_id("▁") not in eos

    # Wrong n_bins trips the vocab-size assert
    # (reference: pocket_tts_mlx/conditioners/text.py:21).
    with pytest.raises(AssertionError, match="vocab_size"):
        SentencePieceTokenizer(n + 1, str(model_file))

    # make_tokenizer picks the real branch for a readable local .model
    built = make_tokenizer(n, str(model_file))
    assert isinstance(built, SentencePieceTokenizer)


def test_split_into_best_sentences_with_real_tokenizer(model_file):
    from pocket_tts_tpu.models.text import SentencePieceTokenizer, split_into_best_sentences

    tok = SentencePieceTokenizer(len(_fixture_pieces()), str(model_file))
    text = "Hello world. The fox ran. Who? Me!"
    chunks = split_into_best_sentences(tok, text, max_tokens=8)
    assert len(chunks) >= 2
    assert "".join(c.replace(" ", "") for c in chunks).lower().startswith("helloworld.")


# ----------------------------------------------------- precompiled charsmap


def _charsmap_fixture():
    # A slice of real NFKC behavior: fullwidth, ligature, circled digit,
    # precomposed-vs-combining, and a multi-char key.
    return {
        "Ａ": "A",          # fullwidth A
        "ﬁ": "fi",          # latin ligature fi
        "①": "1",           # circled one
        "é": "é",     # e + combining acute -> precomposed
        "…": "...",         # ellipsis
        "ＡＢ": "AB",        # longest-match over the single-char key
    }


def test_charsmap_roundtrip_longest_match():
    from pocket_tts_tpu.utils.spm import _Charsmap, build_precompiled_charsmap

    cm = _Charsmap(build_precompiled_charsmap(_charsmap_fixture()))
    norm = lambda s: cm.normalize_bytes(s.encode("utf-8")).decode("utf-8")
    assert norm("Ａ") == "A"
    assert norm("ＡＢ") == "AB"          # longest match wins over Ａ->A
    assert norm("ＡＣ") == "AＣ"         # fall back to the 1-char key
    assert norm("ﬁn") == "fin"
    assert norm("①①x") == "11x"
    assert norm("café …") == "café ..."
    assert norm("plain ascii.") == "plain ascii."


def test_charsmap_applied_in_tokenizer(tmp_path):
    from pocket_tts_tpu.utils.spm import build_precompiled_charsmap

    path = tmp_path / "nfkc.model"
    path.write_bytes(
        build_model_proto(
            _fixture_pieces(),
            normalizer_name="nmt_nfkc",
            precompiled_charsmap=build_precompiled_charsmap(_charsmap_fixture()),
        )
    )
    sp = SentencePieceProcessor(str(path))
    # "ﬁ" is not in the vocabulary; after charsmap NFKC it becomes "fi".
    assert sp.encode("ﬁsh", out_type=str) == sp.encode("fish", out_type=str)
    assert sp.encode("ＡＢc") == sp.encode("ABc")


def test_nfkc_fallback_without_charsmap(tmp_path):
    path = tmp_path / "named.model"
    path.write_bytes(
        build_model_proto(_fixture_pieces(), normalizer_name="nmt_nfkc")
    )
    sp = SentencePieceProcessor(str(path))
    # unicodedata-NFKC fallback: compatibility forms fold to ASCII, zero-width
    # characters vanish, unicode spaces become ASCII space.
    assert sp.encode("ﬁsh", out_type=str) == sp.encode("fish", out_type=str)
    assert sp.encode("a​b") == sp.encode("ab")
    assert sp.encode("a b") == sp.encode("a b")
