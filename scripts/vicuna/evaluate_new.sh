#!/usr/bin/env bash
python scripts/vicuna/evaluate_new.py "$@"
