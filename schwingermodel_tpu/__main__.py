from schwingermodel_tpu.cli import main

raise SystemExit(main())
