"""Migration demo: a reference user's DDL/DML script runs VERBATIM.

Every statement below is lifted from the reference's own test suites
(file:line cited inline) — the forms a migrating user actually has in
scripts — plus the maintenance statements the reference era shipped and
the row-level IUD this engine adds on top. Nothing here uses an API the
reference user would have to learn first; the SQL front door
(carbondata_spark.sql.CarbonSession) is the whole surface.

Run:  python examples/migration.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from carbondata_spark import get_spark
    from carbondata_spark.sql import CarbonSession
    from carbondata_spark.store import CarbonStore

    spark = get_spark(app_name="migration_demo")
    root = tempfile.mkdtemp(prefix="carbondata_migration_")
    cs = CarbonSession(spark, CarbonStore(spark, os.path.join(root, "store")))

    # 1. Hive-syntax DDL — ColumnGroupDataTypesTestCase.scala:34 shape
    #    (STORED BY + TBLPROPERTIES incl. COLUMN_GROUPS, recorded; the
    #    row-major layout is subsumed by Parquet's columnar row groups)
    cs.sql(
        "create table colgrp (column1 string,column2 string,column3 string,"
        "column4 string,measure1 int,measure2 int) "
        "STORED BY 'org.apache.carbondata.format' "
        "TBLPROPERTIES (\"COLUMN_GROUPS\"=\"(column2,column3)\")"
    )
    print("DESCRIBE colgrp:")
    cs.sql("DESC FORMATTED colgrp").show(12, truncate=False)

    # 2. CREATE CUBE with structured OPTIONS — the reference's primary
    #    front door (HighCardinalityDataTypesTestCase.scala:52 shape)
    cs.sql(
        "CREATE CUBE sales DIMENSIONS (city String, uid String, ts Timestamp) "
        "MEASURES (amount Integer) "
        "OPTIONS (NO_DICTIONARY(uid) PARTITIONER [PARTITION_COUNT=1])"
    )

    # 3. LOAD DATA — both statement eras (TestLoadDataWithHiveSyntax.scala:43,47)
    csv = os.path.join(root, "sales.csv")
    with open(csv, "w") as f:
        f.write("city,uid,ts,amount\n")
        for i in range(12):
            f.write(f"c{i % 3},u{i},2020-01-0{1 + i % 5} 00:00:00,{i}\n")
    cs.sql(f"LOAD DATA local inpath '{csv}' INTO table sales")
    cs.sql(
        f"LOAD DATA fact from '{csv}' INTO CUBE sales "
        "PARTITIONDATA(DELIMITER ',', QUOTECHAR '\"')"
    )

    # 4. Load management — CarbonSqlParser.scala:1096-1120 forms
    print("SHOW LOADS:")
    cs.sql("SHOW LOADS FOR CUBE sales").show()
    cs.sql("DELETE LOAD 0 FROM CUBE sales")
    cs.sql("CLEAN FILES FOR CUBE sales")

    # 5. Restructure — ALTER CUBE (CarbonSqlParser.scala:731-776)
    cs.sql(
        "ALTER CUBE sales ADD DIMENSIONS (channel String) "
        "OPTIONS (DEFAULTS [channel = 'legacy'])"
    )

    # 6. Rollup declaration + transparent routing
    cs.sql("CREATE AGGREGATETABLE city, sum(amount) FROM CUBE sales")
    print("Routed GROUP BY (answered from the rollup):")
    cs.sql(
        "SELECT city, sum(amount) AS total FROM sales GROUP BY city ORDER BY city"
    ).show()

    # 7. Row-level IUD — beyond the reference era (takedowns/redaction)
    cs.sql("UPDATE sales SET uid = 'redacted' WHERE amount >= 10")
    cs.sql("DELETE FROM sales WHERE amount < 2")
    print("After IUD:")
    cs.sql("SELECT channel, count(*) AS n FROM sales GROUP BY channel").show()

    # 8. MERGE INTO (r13) — CDC upsert through the SQL front door:
    #    matched keys update from the source, new keys append, one
    #    atomic segment swap
    spark.sql(
        "SELECT 'c0' AS city, timestamp'2020-01-01 00:00:00' AS ts, "
        "99.0 AS amount, 'fixed' AS uid, 'cdc' AS channel"
    ).createOrReplaceTempView("corrections")
    print("MERGE INTO result:")
    cs.sql(
        "MERGE INTO sales USING corrections ON (city) "
        "WHEN MATCHED THEN UPDATE SET amount = s.amount "
        "WHEN NOT MATCHED THEN INSERT *"
    ).show()

    spark.stop()


if __name__ == "__main__":
    main()
