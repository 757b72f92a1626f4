#!/usr/bin/env bash
python scripts/vicuna/dsnot.py "$@"
