"""Text normalization and chunking semantics (reference parity)."""

import math

import pytest

from pocket_tts_tpu.models.text import (
    FallbackWordTokenizer,
    prepare_text_prompt,
    split_into_best_sentences,
)


def test_prepare_empty_raises():
    with pytest.raises(ValueError):
        prepare_text_prompt("   ")


def test_prepare_capitalizes_and_punctuates():
    text, guess = prepare_text_prompt("hello world this is five words")
    assert text == "Hello world this is five words."
    assert guess == 1


def test_prepare_short_text_padded_and_guess():
    text, guess = prepare_text_prompt("hi there")
    # <=4 words -> guess 3; <5 words -> 8-space prefix
    assert text == " " * 8 + "Hi there."
    assert guess == 3


def test_prepare_newlines_collapsed():
    text, _ = prepare_text_prompt("One two three\nfour five six seven")
    assert "\n" not in text
    assert text == "One two three four five six seven."


def test_prepare_keeps_trailing_punctuation():
    text, _ = prepare_text_prompt("Stop right there!")
    assert text.endswith("there!")  # alnum check: '!' stays, no extra '.'


def test_split_single_short_sentence():
    tok = FallbackWordTokenizer()
    chunks = split_into_best_sentences(tok, "Hello world this is a test.", max_tokens=50)
    assert len(chunks) == 1


def test_split_packs_sentences_under_budget():
    tok = FallbackWordTokenizer()
    text = "One two three. Four five six. Seven eight nine. Ten eleven twelve."
    # each sentence ~4 tokens; budget 8 -> 2 sentences per chunk
    chunks = split_into_best_sentences(tok, text, max_tokens=8)
    assert len(chunks) == 2
    assert chunks[0].rstrip().endswith("six.")


def test_split_never_breaks_mid_sentence():
    tok = FallbackWordTokenizer()
    text = "Alpha beta gamma delta epsilon zeta eta theta. Iota kappa."
    chunks = split_into_best_sentences(tok, text, max_tokens=3)
    # first sentence exceeds the budget alone but must stay whole
    assert any("theta" in c for c in chunks)
    joined = " ".join(chunks)
    assert "Alpha" in joined and "kappa" in joined


def test_fallback_tokenizer_roundtrip():
    tok = FallbackWordTokenizer()
    text = "Hello world. How are you?"
    ids = tok.encode(text)
    assert tok.decode(ids).strip() == text
    eos = tok.end_of_sentence_tokens()
    assert any(i in eos for i in ids)


def test_prepare_punctuation_only():
    text, guess = prepare_text_prompt("...")
    assert guess == 3  # 1 word <= 4
    assert text.endswith("...")


def test_prepare_single_word():
    text, guess = prepare_text_prompt("hello")
    assert text == " " * 8 + "Hello."
    assert guess == 3


def test_split_empty_text_raises():
    tok = FallbackWordTokenizer()
    with pytest.raises(ValueError):
        split_into_best_sentences(tok, "   ", max_tokens=10)


def test_split_handles_multiple_punctuation_runs():
    tok = FallbackWordTokenizer()
    chunks = split_into_best_sentences(tok, "Wait... Really?! Yes. Done now.", max_tokens=4)
    assert len(chunks) >= 2
    assert "".join(chunks).count("Wait") == 1


def test_estimate_max_gen_len():
    from pocket_tts_tpu.models.text import estimate_max_gen_len

    # ceil((tokens/3 + 2s) * 12.5): reference tts_model.py:440-444
    assert estimate_max_gen_len(0, 12.5) == 25
    assert estimate_max_gen_len(30, 12.5) == 150
    assert estimate_max_gen_len(1, 12.5) == math.ceil((1 / 3 + 2) * 12.5)

