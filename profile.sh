#!/bin/bash
# Analogue of the reference's profile.sh: capture a jax.profiler trace of the
# attention kernels for one config (default: the README config at seq 8192).
set -e
cd "$(dirname "$0")"
python tools/profile_attention.py "$@"
