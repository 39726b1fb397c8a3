"""Golden-tree diff test (reference check_against_truth,
test_master_class.py:344): the publish path's byte-exact output contract.
Any unintentional format change in mesh/.vtx/.idx writers, the QEM
simplifier, BC7 encoder, stripe fusion, catalog.json, or rig JSON fails
this. Intentional changes: python tools/regen_goldens.py, review, commit."""

import os

import golden_util

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens/publish_mini")


def test_publish_tree_matches_golden(tmp_path):
    out = str(tmp_path / "publish_mini")
    golden_util.generate_publish_tree(out)
    diffs = golden_util.dir_trees_equal(GOLDEN, out)
    assert not diffs, "\n".join(diffs)


def test_dir_trees_equal_detects_differences(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    for d in (a, b):
        os.makedirs(d / "sub")
        (d / "x.bin").write_bytes(b"abc")
        (d / "sub" / "y.json").write_text('{"k": [1, 2]}')
    assert golden_util.dir_trees_equal(str(a), str(b)) == []
    # JSON compares structurally (formatting-insensitive)
    (b / "sub" / "y.json").write_text('{ "k" : [1, 2] }')
    assert golden_util.dir_trees_equal(str(a), str(b)) == []
    (b / "sub" / "y.json").write_text('{"k": [1, 3]}')
    assert golden_util.dir_trees_equal(str(a), str(b)) == ["json differs: sub/y.json"]
    (b / "sub" / "y.json").write_text('{"k": [1, 2]}')
    (b / "x.bin").write_bytes(b"abd")
    assert golden_util.dir_trees_equal(str(a), str(b)) == ["bytes differ: x.bin"]
    (b / "extra.bin").write_bytes(b"")
    assert any("only in" in d for d in golden_util.dir_trees_equal(str(a), str(b)))
