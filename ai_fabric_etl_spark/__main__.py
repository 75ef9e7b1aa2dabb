from ai_fabric_etl_spark.run import main

raise SystemExit(main())
