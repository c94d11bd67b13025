"""CLI: ``python -m su2_tpu <config.cfg> [niter]`` (SU2_CFD equivalent)."""

from su2_tpu.driver import main

raise SystemExit(main())
