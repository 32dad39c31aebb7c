from lbm_tpu.cli import main

raise SystemExit(main())
