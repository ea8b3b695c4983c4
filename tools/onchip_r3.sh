#!/bin/bash
# Round-3 on-chip batch: runs the queued hardware work in value order, each
# step under its own timeout, continuing past failures (the axon tunnel can
# drop mid-run). Logs land in onchip_logs/. Re-runnable; finished steps can
# be skipped by deleting their entry below.
cd /root/repo
mkdir -p onchip_logs
run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a onchip_logs/driver.log
  timeout "$tmo" "$@" > "onchip_logs/$name.log" 2>&1
  echo "--- $name exit=$? ($(date +%H:%M:%S))" | tee -a onchip_logs/driver.log
}

run smoke_window     2400 python tools/smoke_window_onchip.py
run smoke_softcap    2400 python tools/smoke_softcap_onchip.py
run bench_spec       3600 python tools/bench_spec.py
run attribute_causal 2400 python tools/attribute_causal8k.py
run probe_hd64       2400 python tools/probe_hd64_16k.py
run bench_vs_xla     3600 python tools/bench_vs_xla.py
run eval_quant       5400 python tools/eval_quant.py --layers 4 --dim 2048 \
    --hidden 5504 --heads 16 --kv-heads 16 --vocab 32000 --seqs 4 --seqlen 48
run tune_small      10800 python tools/tune_small.py 512 1024 2048 4096
# full kernel parity suite compiled on-chip (TPU_TEST_REPORT refresh incl.
# the round-3 GQA x boundary matrix, window, softcap); engine/serving tests
# stay CPU-side (host-logic, one compile per shape over the tunnel)
run onchip_suite 21600 env FAT_TEST_BACKEND=tpu python -m pytest \
    tests/test_flash_fwd.py tests/test_flash_bwd.py tests/test_varlen.py \
    tests/test_window.py tests/test_softcap.py tests/test_paged_attention.py \
    tests/test_quant.py -q
echo "=== batch done ($(date +%H:%M:%S)) ===" | tee -a onchip_logs/driver.log
