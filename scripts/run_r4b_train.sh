#!/bin/bash
# r4b: retrain with the speaker cycle-consistency views (see run_r4_train.sh
# for the restart-wrapper rationale).  Shorter budget: the r4 run showed the
# speaker/duration/FSQ objectives converge well before 6k steps and mel MAE
# reaches the corpus noise floor by ~5k.
set -u
cd /root/repo
W=runs/r4b
mkdir -p "$W"

for i in 1 2 3; do
  python scripts/train_pipeline.py --steps1 6000 --steps2 0 --steps3 0 \
    --gate-every 1000 --eval-every 100 --workdir "$W" --stop-after 1 \
    $([ -d "$W/stage1_state" ] && echo "--resume-stage1 $W/stage1_state") \
    >> runs/r4b_train_s1.log 2>&1
  rc=$?
  echo "segment1 attempt $i exit $rc" >> runs/r4b_train_s1.log
  [ $rc -eq 0 ] && break
done

for i in 1 2 3; do
  python scripts/train_pipeline.py --steps1 6000 --steps2 3000 --steps3 500 \
    --gate-every 1000 --eval-every 100 --workdir "$W" \
    --skip-stage1 "$W/stage1" \
    $([ -d "$W/stage2_state" ] && echo "--resume-stage2 $W/stage2_state") \
    >> runs/r4b_train_s23.log 2>&1
  rc=$?
  echo "segment2 attempt $i exit $rc" >> runs/r4b_train_s23.log
  [ $rc -eq 0 ] && break
done
echo "run_r4b_train done rc=$rc"
