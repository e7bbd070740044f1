#!/bin/bash
# Round-5 campaign chain: flagship (ref+ours, resume) then attention arm.
cd /root/repo
SEEDS=11,17,29,37,53,61,71,83,91,101,111
R=.campaign_r5/flagship/results.jsonl
python tools/flagship_campaign.py --out .campaign_r5/flagship \
  --seeds $SEEDS --skip_done \
  >> .campaign_r5/flagship.log 2>&1 &
MAIN=$!
# start the attention arm as soon as the chip frees up (all 11 ours
# full_deprel rows present), while reference CPU runs continue
while true; do
  n=$(grep -cF '"framework": "gcn_tpu", "adj_type": "full_deprel"' $R 2>/dev/null || echo 0)
  [ "$n" -ge 11 ] && break
  kill -0 $MAIN 2>/dev/null || break
  sleep 30
done
python tools/flagship_campaign.py --out .campaign_r5/flagship \
  --seeds $SEEDS --ours_only --adj_type attention --tag attention --skip_done \
  >> .campaign_r5/attention.log 2>&1
wait $MAIN
echo ALL_CAMPAIGNS_DONE
