from boslam.cli import main

raise SystemExit(main())
