#!/usr/bin/env bash
python scripts/t5/train.py "$@"
