from vio_msckf_tpu.cli import main

raise SystemExit(main())
