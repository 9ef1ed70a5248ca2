#!/usr/bin/env python
"""CLI shim matching the reference driver invocation
(reference: launch_garmentdreamer.py:14-49):

    python launch_garmentdreamer.py --template_path T.obj --prompt "..." \
        [--gs_config ...] [--deformer_config ...] [--netf_config ...] \
        [--output_folder outputs]
"""
from garmentdreamer_tpu.pipeline.launch import main

if __name__ == "__main__":
    main()
