#!/usr/bin/env bash
# Poll the axon tunnel; the moment jax.devices() responds, capture every
# pending TPU row (tools/run_tpu_rows.sh) once and exit. Run detached:
#   nohup bash tools/wait_and_capture.sh & echo $! > /tmp/tpuwait.pid
# Records its own pid in tools/tpu_capture.pid so a fresh bench.py
# invocation (e.g. the driver's round-end run) can preempt the whole
# capture tree instead of contending for the single tunnel; the capture
# resumes from tools/tpu_rows.done on the next start.
set -u
cd "$(dirname "$0")/.."
log=tools/tpu_wait.log
echo $$ > tools/tpu_capture.pid
# marker up for the WHOLE lifetime, polling included: each 180s probe
# below holds the axon tunnel too, and a concurrent bench must be able to
# preempt the poller mid-probe (two tunnel clients have crashed the
# worker). bench verifies identity via /proc/<pid>/cmdline, so a stale
# marker+pid surviving a hard reboot cannot make it kill a reused pid.
touch tools/tpu_capture.running
trap 'rm -f tools/tpu_capture.running tools/tpu_capture.pid' EXIT
for i in $(seq 1 100); do
  if timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "tunnel up at $(date -Is) (attempt $i)" >> "$log"
    bash tools/run_tpu_rows.sh >> "$log" 2>&1
    echo "capture done at $(date -Is)" >> "$log"
    exit 0
  fi
  echo "tunnel down at $(date -Is) (attempt $i)" >> "$log"
  sleep 540
done
echo "gave up at $(date -Is)" >> "$log"
