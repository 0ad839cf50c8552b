from hispmv_tpu.cli import main

raise SystemExit(main())
