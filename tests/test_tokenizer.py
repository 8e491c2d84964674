"""WordPiece tokenizer unit tests."""

from crct_tpu.data.tokenizer import BasicTokenizer, WordPieceTokenizer


def test_basic_tokenizer_lowercase_punct():
    bt = BasicTokenizer()
    assert bt.tokenize("Hello, World!") == ["hello", ",", "world", "!"]
    assert bt.tokenize("  a\tb\nc ") == ["a", "b", "c"]


def test_basic_tokenizer_accents():
    bt = BasicTokenizer()
    assert bt.tokenize("Café") == ["cafe"]


def test_wordpiece_greedy_longest_match():
    vocab = {"[PAD]": 0, "[UNK]": 100, "[CLS]": 101, "[SEP]": 102,
             "[MASK]": 103, "un": 1, "##able": 2, "##b": 3, "##le": 4,
             "able": 5}
    tok = WordPieceTokenizer(vocab)
    assert tok.wordpiece("unable") == ["un", "##able"]
    assert tok.wordpiece("able") == ["able"]
    assert tok.wordpiece("xyz") == ["[UNK]"]


def test_synthetic_vocab_roundtrip():
    tok = WordPieceTokenizer.synthetic(words=["revenue", "exports"])
    ids = tok.encode("Revenue exceeds 42.5 exports!")
    assert all(i != tok.unk_id for i in ids)
    text = tok.decode(ids)
    assert "revenue" in text and "exports" in text
    # special ids follow the bert-base-uncased layout
    assert (tok.pad_id, tok.unk_id, tok.cls_id, tok.sep_id, tok.mask_id) == \
        (0, 100, 101, 102, 103)


def test_numbers_tokenize_without_unk():
    tok = WordPieceTokenizer.synthetic()
    for s in ["3.14", "-42", "1000000", "0.5%"]:
        assert tok.unk_id not in tok.encode(s), s
