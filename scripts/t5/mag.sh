#!/usr/bin/env bash
python scripts/t5/mag.py "$@"
