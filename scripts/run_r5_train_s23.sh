#!/bin/bash
# r5 stages 2+3 on top of runs/r5/stage1 (launched separately from stage 1 so
# the dispersion findings — scripts/probe_dispersion.py, VERDICT r4 item 4 —
# could land in config before the stage-2 program compiles).
# Budgets: stage 2 at run-A's 4000 steps (~24 min); stage 3 at 2500 steps =
# 4 epochs over the FIXED 10k-sample pool (A7 bounds data, not steps —
# VERDICT r4 item 6 wants a longer student schedule vs the frozen teacher).
set -u
cd /root/repo
W=runs/r5

for i in 1 2 3; do
  python scripts/train_pipeline.py --steps1 10000 --steps2 4000 --steps3 2500 \
    --gate-every 1000 --eval-every 100 --workdir "$W" \
    --skip-stage1 "$W/stage1" \
    $([ -d "$W/stage2_state" ] && echo "--resume-stage2 $W/stage2_state") \
    >> runs/r5_train_s23.log 2>&1
  rc=$?
  echo "segment2 attempt $i exit $rc" >> runs/r5_train_s23.log
  [ $rc -eq 0 ] && break
done
echo "run_r5 stages 2+3 done rc=$rc"
