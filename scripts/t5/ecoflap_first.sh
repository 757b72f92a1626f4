#!/usr/bin/env bash
python scripts/t5/ecoflap_first.py "$@"
