"""Lafida sequence driver (Examples/cubemap_lafida.cpp analog).

Same positional argv contract; the image list uses the Lafida
"id timestamp filename" format (cubemap_lafida.cpp:91-107).
"""

from cubemapslam_tpu.apps.run_sequence import main

if __name__ == "__main__":
    raise SystemExit(main())
