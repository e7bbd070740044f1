#!/bin/bash
# Fetch the official SemEval-2010 Task 8 distribution and stage the two
# files tools/convert_semeval.py consumes.  (The reference repo ships no
# SemEval fetch path at all — its semeval JSONs are assumed pre-parsed.)
#
# After this: parse + convert + train + gate — see the acceptance recipe
# in tools/convert_semeval.py's docstring (expected C-GCN test F1 >= 0.82;
# paper reports 84.8, reference README.md:4).
set -euo pipefail

DEST=${1:-dataset/semeval_raw}
mkdir -p "$DEST"
cd "$DEST"

# The task data is distributed via the task organizers' Google Docs link;
# this GitHub mirror carries the same files and is curl-able.  TRUST
# ASSUMPTION: the mirror is an unofficial third party — the sentence-count
# check below catches truncation but not content tampering, and tampered
# text would flow straight into the F1 quality gate.  On first successful
# fetch, pin the printed sha256 sums via SEMEVAL_TRAIN_SHA256 /
# SEMEVAL_TEST_SHA256 (env) so later fetches fail closed on any change;
# or diff against the organizers' official distribution.
BASE="https://raw.githubusercontent.com/sahitya0000/Relation-Classification/master/corpus/SemEval2010_task8_all_data"

curl -fL --retry 3 -o TRAIN_FILE.TXT \
  "$BASE/SemEval2010_task8_training/TRAIN_FILE.TXT"
curl -fL --retry 3 -o TEST_FILE_FULL.TXT \
  "$BASE/SemEval2010_task8_testing_keys/TEST_FILE_FULL.TXT"

wc -l TRAIN_FILE.TXT TEST_FILE_FULL.TXT
sha256sum TRAIN_FILE.TXT TEST_FILE_FULL.TXT

check_sha() {  # check_sha FILE EXPECTED_SHA (skip when unpinned)
  [ -z "$2" ] && return 0
  echo "$2  $1" | sha256sum -c - || {
    echo "FATAL: $1 does not match the pinned sha256 — mirror changed"; exit 1; }
}
check_sha TRAIN_FILE.TXT "${SEMEVAL_TRAIN_SHA256:-}"
check_sha TEST_FILE_FULL.TXT "${SEMEVAL_TEST_SHA256:-}"
# sanity: 8000 train + 2717 test sentences (4 lines each in the format)
python3 - <<'EOF'
for name, want in (("TRAIN_FILE.TXT", 8000), ("TEST_FILE_FULL.TXT", 2717)):
    n = sum(1 for ln in open(name, encoding="utf-8")
            if ln.split("\t")[0].strip().isdigit())
    assert n == want, f"{name}: {n} sentences, expected {want}"
    print(f"{name}: {n} sentences OK")
EOF

echo "Staged. Next: python tools/convert_semeval.py --train $DEST/TRAIN_FILE.TXT \\"
echo "  --test $DEST/TEST_FILE_FULL.TXT --out dataset/semeval --corenlp http://localhost:9000"
