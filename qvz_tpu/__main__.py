from qvz_tpu.cli import main

raise SystemExit(main())
