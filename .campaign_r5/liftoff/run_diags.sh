#!/bin/bash
cd /root/repo
D=.campaign_r5/liftoff
for s in 29 111 17; do
  for fw in ours reference; do
    timeout 3000 python tools/liftoff_diag.py --framework $fw \
      --workdir .campaign_r5/flagship/seed$s --seed $s --epochs 20 \
      --out $D/base_${fw}_s${s}.jsonl > /dev/null 2>> $D/errors.log
  done
done
# mechanism ablations, ours, worst seed
timeout 3000 python tools/liftoff_diag.py --framework ours \
  --workdir .campaign_r5/flagship/seed29 --seed 29 --epochs 20 \
  --word_dropout 0 --out $D/ablate_word_drop_s29.jsonl > /dev/null 2>> $D/errors.log
timeout 3000 python tools/liftoff_diag.py --framework ours \
  --workdir .campaign_r5/flagship/seed29 --seed 29 --epochs 20 \
  --input_dropout 0 --out $D/ablate_input_drop_s29.jsonl > /dev/null 2>> $D/errors.log
timeout 3000 python tools/liftoff_diag.py --framework ours \
  --workdir .campaign_r5/flagship/seed29 --seed 29 --epochs 20 \
  --gcn_dropout 0 --out $D/ablate_gcn_drop_s29.jsonl > /dev/null 2>> $D/errors.log
echo LIFTOFF_DIAGS_DONE
