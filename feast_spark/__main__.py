from feast_spark.cli import main

raise SystemExit(main())
