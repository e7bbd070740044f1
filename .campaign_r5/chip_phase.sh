#!/bin/bash
# Chip-phase chain: wait for the attention arm to drain, then run the
# end-to-end artifact (VERDICT item 8), the attention backend sweep
# (item 7), and the ours-side liftoff diagnostics on the chip (item 2).
cd /root/repo
R=.campaign_r5/flagship/results.jsonl
until [ "$(grep -cF '"tag": "attention"' $R)" -ge 11 ]; do
  # bail out if the whole campaign chain died
  pgrep -f tools/flagship_campaign.py > /dev/null || break
  sleep 30
done
echo "chip free: starting e2e $(date -u +%T)"
bash .campaign_r5/e2e/run_e2e.sh > .campaign_r5/e2e/run.log 2>&1
echo "e2e done: starting attention sweep $(date -u +%T)"
timeout 3000 python tools/large_forest_bench.py --attention \
  > .campaign_r5/attn_sweep.jsonl 2>&1
echo "sweep done: starting chip diags $(date -u +%T)"
D=.campaign_r5/liftoff
for s in 29 111 17; do
  timeout 3000 python tools/liftoff_diag.py --framework ours --platform default \
    --workdir .campaign_r5/flagship/seed$s --seed $s --epochs 20 \
    --out $D/base_ours_s${s}.jsonl > /dev/null 2>> $D/errors.log
done
for ab in word_dropout input_dropout gcn_dropout; do
  timeout 3000 python tools/liftoff_diag.py --framework ours --platform default \
    --workdir .campaign_r5/flagship/seed29 --seed 29 --epochs 20 \
    --$ab 0 --out $D/ablate_${ab}_s29.jsonl > /dev/null 2>> $D/errors.log
done
echo CHIP_PHASE_DONE
