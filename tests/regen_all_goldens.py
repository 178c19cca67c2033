"""One-command regeneration of EVERY committed golden oracle.

If the driver regenerates /root/testdata (it happened between rounds 3
and 4: the events timestamp layout changed), every corpus_sig-keyed
golden goes loudly red in pytest/strict_sweep.  Recovery is this one
command, then commit the refreshed fixtures:

    python tests/regen_all_goldens.py [sf_dir ...]

Runs, in order: the dedup goldens (minhash/simhash), the BPE goldens,
the classifier weights, the ANN probe goldens, and the former
rows-only probe goldens.  Each sub-script prints what it wrote; all
quality contracts stay in pytest and are unaffected.
"""

from __future__ import annotations

import sys

import regen_ann_goldens
import regen_bpe_goldens
import regen_classifier_golden
import regen_dedup_goldens
import regen_rowsonly_goldens

if __name__ == "__main__":
    dirs = sys.argv[1:]
    for mod in (
        regen_dedup_goldens,
        regen_bpe_goldens,
        regen_classifier_golden,
        regen_ann_goldens,
        regen_rowsonly_goldens,
    ):
        print(f"=== {mod.__name__} ===")
        mod.main(dirs or mod.DEFAULT_SF_DIRS)
