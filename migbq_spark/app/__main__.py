from migbq_spark.app.cli import main

raise SystemExit(main())
