"""Alias module mirroring the reference's `las/arguments.py` import path.

The reference exposes `parse_args()` / `str2bool` from las/arguments.py
(las/arguments.py:4-10, :12-232); here the flag system lives in config.py.
This shim keeps `from automatic_speech_recognition_tpu.arguments import
parse_args` working for users porting reference scripts.
"""

from .config import Config, build_parser, parse_args, str2bool  # noqa: F401
