"""Regenerate the committed golden trees under tests/goldens/.

Run after an INTENTIONAL format change, review the diff, and commit:
    python tools/regen_goldens.py
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import golden_util

if __name__ == "__main__":
    dest = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests/goldens/publish_mini")
    shutil.rmtree(dest, ignore_errors=True)
    golden_util.generate_publish_tree(dest)
    n = len(golden_util.tree_files(dest))
    print(f"regenerated {dest} ({n} files)")
