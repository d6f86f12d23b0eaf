from izpi_tpu.cli import main

raise SystemExit(main())
