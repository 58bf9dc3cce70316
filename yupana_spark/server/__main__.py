from .pgwire import main

raise SystemExit(main())
