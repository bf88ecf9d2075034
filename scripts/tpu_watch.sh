#!/bin/bash
# Retry the TPU until execution works, then run the round-2 probe suite.
# One TPU process at a time; killed attempts hold the grant ~5 min, so
# attempts are spaced >6 min apart.
LOG=/tmp/tpu_watch.log
PY="python"
export PYTHONPATH=/root/repo:/root/.axon_site
echo "=== tpu_watch start $(date) ===" >> $LOG
for attempt in $(seq 1 40); do
  echo "--- attempt $attempt $(date) ---" >> $LOG
  timeout -s KILL 300 $PY /tmp/tpu_smoke.py >> $LOG 2>&1
  rc=$?
  echo "smoke rc=$rc" >> $LOG
  if [ $rc -eq 0 ]; then
    echo "=== CHIP LIVE, running probes $(date) ===" >> $LOG
    timeout -s KILL 1800 $PY /root/repo/scripts/probe_mxu_fft.py 256 >> $LOG 2>&1
    echo "probe_mxu rc=$?" >> $LOG
    MSM_FFT=mxu timeout -s KILL 1800 $PY /root/repo/scripts/probe_step.py 256 >> $LOG 2>&1
    echo "step mxu 256 rc=$?" >> $LOG
    MSM_FFT=xla timeout -s KILL 1800 $PY /root/repo/scripts/probe_step.py 256 >> $LOG 2>&1
    echo "step xla 256 rc=$?" >> $LOG
    MSM_FFT=mxu timeout -s KILL 2400 $PY /root/repo/scripts/probe_step.py 512 8 >> $LOG 2>&1
    echo "step mxu 512 rc=$?" >> $LOG
    echo "=== probes done $(date) ===" >> $LOG
    exit 0
  fi
  sleep 420
done
echo "=== giving up $(date) ===" >> $LOG
exit 1
