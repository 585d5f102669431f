"""Word-map layout parity with the reference (preparedataset.py:149-186)."""

from lrp_imagecaptioning_tpu.data.vocab import (
    WordMap,
    build_word_map,
    decode_to_words,
    encode_caption,
    remove_bad_endings,
)


def test_word_map_layout():
    caps = [["a", "dog", "runs"], ["a", "cat", "sits"], ["a", "dog", "sits"]]
    wm = build_word_map(caps, min_word_freq=2)
    # freq>=2: a(3), dog(2), sits(2); cat/runs dropped
    assert wm["a"] == 1 and wm["dog"] == 2 and wm["sits"] == 3
    assert wm["<unk>"] == 4 and wm["<start>"] == 5 and wm["<end>"] == 6
    assert wm["<pad>"] == 0
    assert len(wm) == 7
    assert wm.num_embeddings == 7  # max id + 1 == len(word_map)


def test_encode_caption():
    wm = build_word_map([["a", "dog"]], min_word_freq=1)
    enc, caplen = encode_caption(["a", "dog", "flies"], wm, max_len=5)
    assert enc == [wm.start, wm["a"], wm["dog"], wm.unk, wm.end, 0, 0]
    assert caplen == 5
    assert len(enc) == 5 + 2


def test_decode_strips_specials():
    wm = build_word_map([["a", "dog"]], min_word_freq=1)
    enc, _ = encode_caption(["a", "dog"], wm, max_len=4)
    assert decode_to_words(enc, wm) == ["a", "dog"]


def test_remove_bad_endings():
    assert remove_bad_endings(["a dog sits on the"]) == ["a dog sits"]
    # trimming to empty keeps the original (gridTDmodel.py:297-299)
    assert remove_bad_endings(["the and of"]) == ["the and of"]
    assert remove_bad_endings(["a dog"]) == ["a dog"]


def test_bad_endings_family_split():
    """AoA's list omits 'and' (aoamodel.py:22 vs gridTDmodel.py:21) — a
    caption ending in 'and' must survive AoA post-processing but be trimmed
    for gridTD/adaptive."""
    from lrp_imagecaptioning_tpu.data.vocab import bad_endings_for

    sent = ["a dog and a cat and"]
    assert remove_bad_endings(sent, bad_endings_for("gridtd")) == [
        "a dog and a cat"]
    assert remove_bad_endings(sent, bad_endings_for("adaptive")) == [
        "a dog and a cat"]
    assert remove_bad_endings(sent, bad_endings_for("aoa")) == sent
    assert remove_bad_endings(sent, bad_endings_for("aoa_bu")) == sent


def test_roundtrip_save_load(tmp_path):
    wm = build_word_map([["x", "y"]], min_word_freq=1)
    p = tmp_path / "wm.json"
    wm.save(str(p))
    wm2 = WordMap.load(str(p))
    assert wm2.word_to_id == wm.word_to_id
