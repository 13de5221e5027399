#!/bin/bash
# r5 stages 2+3 on top of runs/r5/stage1 (launched separately from stage 1 so
# the dispersion findings — scripts/probe_dispersion.py, VERDICT r4 item 4 —
# could land in config before the stage-2 program compiles).
# Budgets: run-A's (stage 2: 4000 steps ~24 min, stage 3: 625 ~7 min).
set -u
cd /root/repo
W=runs/r5

for i in 1 2 3; do
  python scripts/train_pipeline.py --steps1 10000 --steps2 4000 --steps3 625 \
    --gate-every 1000 --eval-every 100 --workdir "$W" \
    --skip-stage1 "$W/stage1" \
    $([ -d "$W/stage2_state" ] && echo "--resume-stage2 $W/stage2_state") \
    >> runs/r5_train_s23.log 2>&1
  rc=$?
  echo "segment2 attempt $i exit $rc" >> runs/r5_train_s23.log
  [ $rc -eq 0 ] && break
done
echo "run_r5 stages 2+3 done rc=$rc"
