#!/bin/bash
# Analogue of the reference's install.sh: build the native runtime and
# install the package in editable mode.
set -e
make -C "$(dirname "$0")/csrc"
pip install -e "$(dirname "$0")"
