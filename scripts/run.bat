@echo off
REM Example end-to-end run (parity: reference scripts/run.bat).
python -m deep_image_matching_tpu --dir %1 --pipeline superpoint+lightglue --strategy matching_lowres --force
