#!/usr/bin/env bash
python scripts/vicuna/train.py "$@"
