"""Deterministic TPC-DS-schema dataset generator (qualification scale).

The reference validates the REAL TPC-DS queries against the real schema
(`flink-end-to-end-tests/flink-tpcds-test/src/main/java/org/apache/flink/
table/tpcds/TpcdsTestProgram.java:75-86` runs all 103 queries;
`test-scripts/test_tpcds.sh:22` at SF=1). Shapes over fixture tables prove
operator coverage but not the query texts, so this module generates a
small, seeded, engine-portable dataset with the actual TPC-DS table
schemas (the column subset the registered queries touch, real column
names incl. the spec's `s_tax_precentage` spelling, real value domains
from the public TPC-DS specification) and writes one parquet file per
table. Both engines read the SAME files, so cross-engine value parity
reduces to the query computation itself.

Scale intuition (the 100 TB angle): this dataset exists for correctness
qualification, like the reference's SF=1 run — the queries registered over
it are plain declarative Spark SQL whose plans (star joins with broadcast
dims, partial aggs, rollups) are exactly what runs on a full-size
`store_sales`; nothing here changes shape with volume.

Determinism: numpy's legacy RandomState (frozen algorithms) with a fixed
seed; regeneration on any machine yields byte-identical values. The
directory carries a version marker — bump _VERSION when changing anything.
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_VERSION = "v1"
_SEED = 20260814

TPCDS_TABLES = (
    "date_dim", "time_dim", "item", "customer", "customer_address",
    "customer_demographics", "household_demographics", "store", "warehouse",
    "promotion", "reason", "ship_mode", "web_site", "web_page",
    "call_center", "income_band", "catalog_page",
    "store_sales", "store_returns", "catalog_sales", "catalog_returns",
    "web_sales", "web_returns", "inventory",
)

# row counts (qualification scale)
_N_ITEM = 2000
_N_CUSTOMER = 10_000
_N_ADDR = 5000
_N_HD = 720
_N_STORE = 12
_N_WAREHOUSE = 5
_N_PROMO = 300
_N_TICKETS = 40_000          # store_sales baskets (avg 3 lines -> ~120k rows)
_N_CS = 30_000
_N_WS = 30_000
_N_SR = 12_000
_N_INV_ITEMS = 400           # items tracked weekly per warehouse

_CATEGORIES = ("Sports", "Books", "Home", "Electronics", "Jewelry",
               "Men", "Music", "Children", "Shoes", "Women")
_CLASSES = ("accessories", "classical", "fiction", "fitness", "mens watch",
            "pants", "pop", "reference", "romance", "shirts")
_GENDERS = ("M", "F")
_MARITAL = ("S", "M", "D", "W", "U")
_EDUCATION = ("Primary", "Secondary", "College", "2 yr Degree",
              "4 yr Degree", "Advanced Degree", "Unknown")
_BUY_POTENTIAL = (">10000", "5001-10000", "1001-5000", "501-1000",
                  "0-500", "Unknown")
_CREDIT = ("Low Risk", "Good", "High Risk", "Unknown")
_STATES = ("TN", "SD", "TX", "GA", "OH", "IL")
_CITIES = ("Midway", "Fairview", "Oak Grove", "Glendale", "Centerville",
           "Springfield", "Riverside", "Five Points")
_COUNTIES = ("Williamson County", "Ziebach County", "Walker County",
             "Barrow County", "Franklin Parish", "Luce County")
_COLORS = ("red", "blue", "green", "white", "black", "yellow",
           "purple", "orange")
_UNITS = ("Each", "Dozen", "Case", "Pallet")
_DAY_NAMES = ("Sunday", "Monday", "Tuesday", "Wednesday", "Thursday",
              "Friday", "Saturday")
_MEALS = ("breakfast", "dinner", "lunch", "")
_SM_TYPES = ("EXPRESS", "NEXT DAY", "OVERNIGHT", "REGULAR", "TWO DAY")
_SM_CODES = ("AIR", "SURFACE", "SEA", "SHIP")
_FIRST_NAMES = ("James", "Mary", "John", "Linda", "David", "Susan",
                "Michael", "Karen", "Robert", "Nancy", "Maria", "Daniel")
_LAST_NAMES = ("Smith", "Johnson", "Williams", "Jones", "Brown", "Davis",
               "Miller", "Wilson", "Moore", "Taylor", "Anderson", "Thomas")

_BASE_DATE = dt.date(1998, 1, 1)
_N_DAYS = (dt.date(2003, 12, 31) - _BASE_DATE).days + 1   # 2191
_BASE_DATE_SK = 2450815                                    # julian 1998-01-01
_SALES_DAYS = (dt.date(2002, 12, 31) - _BASE_DATE).days + 1  # facts: 1998-2002
_BASE_MONTH_SEQ = 1176                                     # Jan 1998


def _dec(cents: np.ndarray, precision: int = 7) -> pa.Array:
    """int64 cents -> decimal128(precision, 2) without float round-trips.

    Vectorized: cents ARE the unscaled decimal value at scale 2, so the
    Arrow array is built directly from the 128-bit two's-complement
    buffer (low word = value, high word = sign extension) — per-value
    Python Decimal construction made scaled generation (millions of fact
    rows x ~13 decimal columns) minutes-slow. Values are bit-identical
    to the old Decimal path (the determinism test compares parquet md5s
    against a dataset written by it)."""
    a = np.asarray(cents)
    if a.dtype == object:  # nullable input: rare, keep the exact slow path
        import decimal  # noqa: PLC0415

        vals = [
            None if c is None else decimal.Decimal(int(c)) / decimal.Decimal(100)
            for c in a.tolist()
        ]
        return pa.array(vals, type=pa.decimal128(precision, 2))
    a = a.astype(np.int64)
    buf = np.empty((len(a), 2), dtype="<i8")
    buf[:, 0] = a
    buf[:, 1] = np.where(a < 0, -1, 0)
    return pa.Array.from_buffers(
        pa.decimal128(precision, 2), len(a), [None, pa.py_buffer(buf.tobytes())]
    )


def _maybe_null(rng: np.random.RandomState, arr: np.ndarray, pct: float):
    """Return a Python list with ~pct of entries None (TPC-DS nullable fks)."""
    mask = rng.random_sample(len(arr)) < pct
    out = arr.astype(object)
    out[mask] = None
    return out.tolist()


def _write(d: str, name: str, cols: dict) -> None:
    arrays, fields = [], []
    for cname, data in cols.items():
        arr = data if isinstance(data, pa.Array) else pa.array(data)
        arrays.append(arr)
        fields.append(pa.field(cname, arr.type))
    pq.write_table(pa.table(arrays, schema=pa.schema(fields)),
                   os.path.join(d, f"{name}.parquet"))


# The bench's SF1-equivalent multiplier: 25x the qualification facts puts
# store_sales at ~3M lines (the spec's SF=1 is 2.88M), catalog_sales /
# web_sales at 750k each, inventory at the full weekly grid over 10k
# items — the volume the reference's test_tpcds.sh:22 SF=1 run validates
# at. Each scale gets its own directory, so qualification parity (the
# sf0.01 driver gate and the sf0.001 pytest oracles) reads v1 untouched.
BENCH_SCALE = 25.0


def tpcds_dir(scale: float = 1.0) -> str:
    suffix = "" if scale == 1.0 else f"_sf{scale:g}"
    return os.path.join(tempfile.gettempdir(), f"fps_tpcds_{_VERSION}{suffix}")


def ensure_tpcds(scale: float = 1.0) -> str:
    """Generate the dataset once per machine; return its directory.

    Generation goes into a staging dir that is atomically renamed into
    place, so a concurrent reader never sees a half-written dataset (a
    mid-generation read would silently diverge the two engines)."""
    d = tpcds_dir(scale)
    marker = os.path.join(d, "_COMPLETE")
    if os.path.exists(marker):
        return d
    stage = f"{d}.stage.{os.getpid()}"
    os.makedirs(stage, exist_ok=True)
    _generate(stage, scale)
    with open(os.path.join(stage, "_COMPLETE"), "w"):
        pass
    try:
        os.rename(stage, d)
    except OSError:
        # another process won the race; use its complete copy
        import shutil  # noqa: PLC0415

        shutil.rmtree(stage, ignore_errors=True)
    return d


def _generate(d: str, scale: float = 1.0) -> None:  # noqa: PLR0915 - one linear build per table
    # Scaled row counts shadow the module-level qualification constants as
    # locals for the rest of this function: facts and the fact-referenced
    # dims grow linearly (the TPC-DS spec's own dim growth is roughly
    # linear in SF at small SF); stores/warehouses/promotions stay at the
    # spec's SF1 cardinalities, which the base counts already are.
    g = globals()
    _N_ITEM = max(1, int(g["_N_ITEM"] * scale))
    _N_CUSTOMER = max(1, int(g["_N_CUSTOMER"] * scale))
    _N_ADDR = max(1, int(g["_N_ADDR"] * scale))
    _N_HD = max(1, int(g["_N_HD"] * scale))
    _N_TICKETS = max(1, int(g["_N_TICKETS"] * scale))
    _N_CS = max(1, int(g["_N_CS"] * scale))
    _N_WS = max(1, int(g["_N_WS"] * scale))
    _N_SR = max(1, int(g["_N_SR"] * scale))
    _N_INV_ITEMS = max(1, int(g["_N_INV_ITEMS"] * scale))
    _N_CH_RET = max(1, int(6000 * scale))  # catalog/web returns

    rng = np.random.RandomState(_SEED)

    # ---- date_dim -------------------------------------------------------
    days = [_BASE_DATE + dt.timedelta(days=i) for i in range(_N_DAYS)]
    _write(d, "date_dim", {
        "d_date_sk": [_BASE_DATE_SK + i for i in range(_N_DAYS)],
        "d_date_id": [f"AAAAAAAA{_BASE_DATE_SK + i:08d}" for i in range(_N_DAYS)],
        "d_date": pa.array(days, type=pa.date32()),
        "d_year": [x.year for x in days],
        "d_moy": [x.month for x in days],
        "d_dom": [x.day for x in days],
        "d_qoy": [(x.month - 1) // 3 + 1 for x in days],
        "d_dow": [(x.weekday() + 1) % 7 for x in days],       # Sunday = 0
        "d_day_name": [_DAY_NAMES[(x.weekday() + 1) % 7] for x in days],
        "d_month_seq": [
            _BASE_MONTH_SEQ + (x.year - 1998) * 12 + x.month - 1 for x in days
        ],
        "d_week_seq": [
            ((x - _BASE_DATE).days + (_BASE_DATE.weekday() + 1) % 7) // 7 + 5218
            for x in days
        ],
        "d_quarter_name": [
            f"{x.year}Q{(x.month - 1) // 3 + 1}" for x in days
        ],
        "d_holiday": ["Y" if (x.month, x.day) in ((7, 4), (12, 25)) else "N"
                      for x in days],
        "d_weekend": ["Y" if x.weekday() >= 5 else "N" for x in days],
    })

    # ---- time_dim -------------------------------------------------------
    secs = np.arange(86400)
    hours = secs // 3600
    _write(d, "time_dim", {
        "t_time_sk": secs,
        "t_time_id": [f"AAAAAAAA{s:08d}" for s in secs],
        "t_time": secs,
        "t_hour": hours,
        "t_minute": (secs % 3600) // 60,
        "t_second": secs % 60,
        "t_am_pm": ["AM" if h < 12 else "PM" for h in hours],
        "t_meal_time": [
            "breakfast" if 6 <= h < 9 else
            "lunch" if 11 <= h < 13 else
            "dinner" if 17 <= h < 20 else None
            for h in hours
        ],
    })

    # ---- item -----------------------------------------------------------
    cat_id = rng.randint(1, len(_CATEGORIES) + 1, _N_ITEM)
    class_id = rng.randint(1, 17, _N_ITEM)
    brand_id = cat_id * 1000000 + class_id * 1000 + rng.randint(1, 10, _N_ITEM)
    manufact_id = rng.randint(1, 1001, _N_ITEM)
    cur_price = rng.randint(99, 9900, _N_ITEM)               # cents
    wholesale = (cur_price * (55 + rng.randint(0, 25, _N_ITEM)) // 100)
    _write(d, "item", {
        "i_item_sk": np.arange(1, _N_ITEM + 1),
        "i_item_id": [f"AAAAAAAA{i:08d}" for i in range(1, _N_ITEM + 1)],
        "i_item_desc": [
            f"Item description {i} {'x' * (i % 40)}" for i in range(_N_ITEM)
        ],
        "i_current_price": _dec(cur_price),
        "i_wholesale_cost": _dec(wholesale),
        "i_brand_id": brand_id,
        "i_brand": [f"brand#{b % 100000}" for b in brand_id],
        "i_class_id": class_id,
        "i_class": [_CLASSES[c % len(_CLASSES)] for c in class_id],
        "i_category_id": cat_id,
        "i_category": [_CATEGORIES[c - 1] for c in cat_id],
        "i_manufact_id": manufact_id,
        "i_manufact": [f"manufact#{m}" for m in manufact_id],
        "i_manager_id": rng.randint(1, 101, _N_ITEM),
        "i_size": [("small", "medium", "large", "extra large", "N/A")[i % 5]
                   for i in range(_N_ITEM)],
        "i_color": [_COLORS[c] for c in rng.randint(0, len(_COLORS), _N_ITEM)],
        "i_units": [_UNITS[u] for u in rng.randint(0, len(_UNITS), _N_ITEM)],
        "i_product_name": [f"product{i}" for i in range(1, _N_ITEM + 1)],
    })

    # ---- customer_demographics (full small cross) -----------------------
    cd_rows = [
        (g, m, e, pe, cr)
        for g in _GENDERS for m in _MARITAL for e in _EDUCATION
        for pe in (500, 1000, 5000, 10000) for cr in _CREDIT
    ]
    n_cd = len(cd_rows)
    _write(d, "customer_demographics", {
        "cd_demo_sk": np.arange(1, n_cd + 1),
        "cd_gender": [r[0] for r in cd_rows],
        "cd_marital_status": [r[1] for r in cd_rows],
        "cd_education_status": [r[2] for r in cd_rows],
        "cd_purchase_estimate": [r[3] for r in cd_rows],
        "cd_credit_rating": [r[4] for r in cd_rows],
        "cd_dep_count": [i % 7 for i in range(n_cd)],
        "cd_dep_employed_count": [i % 5 for i in range(n_cd)],
        "cd_dep_college_count": [i % 4 for i in range(n_cd)],
    })

    # ---- household_demographics ----------------------------------------
    _write(d, "household_demographics", {
        "hd_demo_sk": np.arange(1, _N_HD + 1),
        "hd_income_band_sk": rng.randint(1, 21, _N_HD),
        "hd_buy_potential": [
            _BUY_POTENTIAL[b]
            for b in rng.randint(0, len(_BUY_POTENTIAL), _N_HD)
        ],
        "hd_dep_count": rng.randint(0, 10, _N_HD),
        "hd_vehicle_count": rng.randint(-1, 5, _N_HD),
    })

    # ---- customer_address ----------------------------------------------
    _write(d, "customer_address", {
        "ca_address_sk": np.arange(1, _N_ADDR + 1),
        "ca_address_id": [f"AAAAAAAA{i:08d}" for i in range(1, _N_ADDR + 1)],
        "ca_street_number": [str(100 + i % 900) for i in range(_N_ADDR)],
        "ca_street_name": [f"{_COUNTIES[i % 6].split()[0]} Street"
                           for i in range(_N_ADDR)],
        "ca_city": [_CITIES[c] for c in rng.randint(0, len(_CITIES), _N_ADDR)],
        "ca_county": [_COUNTIES[c]
                      for c in rng.randint(0, len(_COUNTIES), _N_ADDR)],
        "ca_state": [_STATES[s] for s in rng.randint(0, len(_STATES), _N_ADDR)],
        "ca_zip": [f"{10000 + int(z):05d}"
                   for z in rng.randint(0, 500, _N_ADDR)],
        "ca_country": ["United States"] * _N_ADDR,
        "ca_gmt_offset": _dec(
            rng.choice(np.array([-500, -600, -700, -800]), _N_ADDR), 5
        ),
        "ca_location_type": [("apartment", "condo", "single family")[i % 3]
                             for i in range(_N_ADDR)],
    })

    # ---- customer -------------------------------------------------------
    _write(d, "customer", {
        "c_customer_sk": np.arange(1, _N_CUSTOMER + 1),
        "c_customer_id": [f"AAAAAAAA{i:08d}"
                          for i in range(1, _N_CUSTOMER + 1)],
        "c_current_cdemo_sk": _maybe_null(
            rng, rng.randint(1, n_cd + 1, _N_CUSTOMER), 0.03),
        "c_current_hdemo_sk": _maybe_null(
            rng, rng.randint(1, _N_HD + 1, _N_CUSTOMER), 0.03),
        "c_current_addr_sk": rng.randint(1, _N_ADDR + 1, _N_CUSTOMER),
        "c_first_name": [
            _FIRST_NAMES[x]
            for x in rng.randint(0, len(_FIRST_NAMES), _N_CUSTOMER)
        ],
        "c_last_name": [
            _LAST_NAMES[x]
            for x in rng.randint(0, len(_LAST_NAMES), _N_CUSTOMER)
        ],
        "c_preferred_cust_flag": [
            ("Y", "N")[x] for x in rng.randint(0, 2, _N_CUSTOMER)
        ],
        "c_birth_month": rng.randint(1, 13, _N_CUSTOMER),
        "c_birth_year": rng.randint(1930, 1993, _N_CUSTOMER),
        "c_birth_country": [
            ("UNITED STATES", "CANADA", "MEXICO", "GERMANY", "FRANCE",
             "JAPAN", "BRAZIL", "INDIA")[x]
            for x in rng.randint(0, 8, _N_CUSTOMER)
        ],
        "c_salutation": [("Mr.", "Mrs.", "Ms.", "Dr.")[x]
                         for x in rng.randint(0, 4, _N_CUSTOMER)],
        "c_email_address": [f"customer{i}@example.org"
                            for i in range(1, _N_CUSTOMER + 1)],
        "c_first_sales_date_sk": _maybe_null(
            rng, _BASE_DATE_SK + rng.randint(0, _SALES_DAYS, _N_CUSTOMER),
            0.03),
        "c_first_shipto_date_sk": _maybe_null(
            rng, _BASE_DATE_SK + rng.randint(0, _SALES_DAYS, _N_CUSTOMER),
            0.03),
    })

    # ---- store ----------------------------------------------------------
    _write(d, "store", {
        "s_store_sk": np.arange(1, _N_STORE + 1),
        "s_store_id": [f"AAAAAAAA{i:08d}" for i in range(1, _N_STORE + 1)],
        "s_store_name": [("ought", "able", "pri", "ese", "anti", "cally")[i % 6]
                         for i in range(_N_STORE)],
        "s_number_employees": rng.randint(200, 301, _N_STORE),
        "s_floor_space": rng.randint(5_000_000, 10_000_000, _N_STORE),
        "s_hours": [("8AM-8PM", "8AM-4PM", "8AM-12AM")[i % 3]
                    for i in range(_N_STORE)],
        "s_manager": [f"Manager {i}" for i in range(1, _N_STORE + 1)],
        "s_market_id": rng.randint(1, 11, _N_STORE),
        "s_city": [_CITIES[c] for c in rng.randint(0, len(_CITIES), _N_STORE)],
        "s_county": [_COUNTIES[c]
                     for c in rng.randint(0, len(_COUNTIES), _N_STORE)],
        "s_state": [_STATES[s] for s in rng.randint(0, len(_STATES), _N_STORE)],
        "s_zip": [f"{10000 + int(z):05d}"
                  for z in rng.randint(0, 500, _N_STORE)],
        "s_country": ["United States"] * _N_STORE,
        "s_gmt_offset": _dec(
            rng.choice(np.array([-500, -600]), _N_STORE), 5),
        "s_tax_precentage": _dec(rng.randint(0, 12, _N_STORE), 5),
    })

    # ---- warehouse / promotion / reason / ship_mode / web ---------------
    _write(d, "warehouse", {
        "w_warehouse_sk": np.arange(1, _N_WAREHOUSE + 1),
        "w_warehouse_id": [f"AAAAAAAA{i:08d}"
                           for i in range(1, _N_WAREHOUSE + 1)],
        "w_warehouse_name": [f"Warehouse {i}"
                             for i in range(1, _N_WAREHOUSE + 1)],
        "w_warehouse_sq_ft": rng.randint(50_000, 1_000_000, _N_WAREHOUSE),
        "w_city": [_CITIES[c]
                   for c in rng.randint(0, len(_CITIES), _N_WAREHOUSE)],
        "w_county": [_COUNTIES[c]
                     for c in rng.randint(0, len(_COUNTIES), _N_WAREHOUSE)],
        "w_state": [_STATES[s]
                    for s in rng.randint(0, len(_STATES), _N_WAREHOUSE)],
        "w_country": ["United States"] * _N_WAREHOUSE,
    })
    _write(d, "promotion", {
        "p_promo_sk": np.arange(1, _N_PROMO + 1),
        "p_promo_id": [f"AAAAAAAA{i:08d}" for i in range(1, _N_PROMO + 1)],
        "p_promo_name": [("bar", "ought", "ese", "anti")[i % 4]
                         for i in range(_N_PROMO)],
        "p_channel_dmail": [("Y", "N")[x] for x in rng.randint(0, 2, _N_PROMO)],
        "p_channel_email": [("Y", "N")[x] for x in rng.randint(0, 2, _N_PROMO)],
        "p_channel_tv": [("Y", "N")[x] for x in rng.randint(0, 2, _N_PROMO)],
        "p_channel_event": [("Y", "N")[x]
                            for x in rng.randint(0, 2, _N_PROMO)],
        "p_cost": _dec(rng.randint(50_000, 300_000, _N_PROMO), 15),
        "p_response_target": np.ones(_N_PROMO, dtype=np.int64),
    })
    _write(d, "reason", {
        "r_reason_sk": np.arange(1, 36),
        "r_reason_id": [f"AAAAAAAA{i:08d}" for i in range(1, 36)],
        "r_reason_desc": [f"reason {i}" for i in range(1, 36)],
    })
    _write(d, "ship_mode", {
        "sm_ship_mode_sk": np.arange(1, 21),
        "sm_ship_mode_id": [f"AAAAAAAA{i:08d}" for i in range(1, 21)],
        "sm_type": [_SM_TYPES[i % len(_SM_TYPES)] for i in range(20)],
        "sm_code": [_SM_CODES[i % len(_SM_CODES)] for i in range(20)],
        "sm_carrier": [("UPS", "FEDEX", "AIRBORNE", "USPS", "DHL")[i % 5]
                       for i in range(20)],
        "sm_contract": [f"contract{i}" for i in range(20)],
    })
    _write(d, "web_site", {
        "web_site_sk": np.arange(1, 11),
        "web_site_id": [f"AAAAAAAA{i:08d}" for i in range(1, 11)],
        "web_name": [f"site_{i}" for i in range(10)],
        "web_company_name": [("pri", "able", "ese", "bar", "anti")[i % 5]
                             for i in range(10)],
    })
    _write(d, "catalog_page", {
        "cp_catalog_page_sk": np.arange(1, 101),
        "cp_catalog_page_id": [f"AAAAAAAA{i:08d}" for i in range(1, 101)],
        "cp_description": [f"catalog page {i}" for i in range(1, 101)],
        "cp_type": [("bi-annual", "quarterly", "monthly")[i % 3]
                    for i in range(100)],
    })
    _write(d, "call_center", {
        "cc_call_center_sk": np.arange(1, 7),
        "cc_call_center_id": [f"AAAAAAAA{i:08d}" for i in range(1, 7)],
        "cc_name": [f"call center {i}" for i in range(1, 7)],
        "cc_manager": [f"CC Manager {i}" for i in range(1, 7)],
        "cc_county": [_COUNTIES[i % len(_COUNTIES)] for i in range(6)],
    })
    _write(d, "income_band", {
        "ib_income_band_sk": np.arange(1, 21),
        "ib_lower_bound": [(i - 1) * 10000 for i in range(1, 21)],
        "ib_upper_bound": [i * 10000 for i in range(1, 21)],
    })
    _write(d, "web_page", {
        "wp_web_page_sk": np.arange(1, 61),
        "wp_web_page_id": [f"AAAAAAAA{i:08d}" for i in range(1, 61)],
        "wp_char_count": rng.randint(100, 8001, 60),
        "wp_link_count": rng.randint(2, 25, 60),
        "wp_autogen_flag": [("Y", "N")[x] for x in rng.randint(0, 2, 60)],
    })

    # ---- store_sales (basket-structured) --------------------------------
    lines_per_ticket = rng.randint(1, 6, _N_TICKETS)
    n_ss = int(lines_per_ticket.sum())
    ticket = np.repeat(np.arange(1, _N_TICKETS + 1), lines_per_ticket)
    # per-ticket attributes, repeated per line (real baskets share them)
    t_date = _BASE_DATE_SK + rng.randint(0, _SALES_DAYS, _N_TICKETS)
    t_time = rng.randint(8 * 3600, 22 * 3600, _N_TICKETS)
    t_cust = rng.randint(1, _N_CUSTOMER + 1, _N_TICKETS)
    t_cdemo = rng.randint(1, n_cd + 1, _N_TICKETS)
    t_hdemo = rng.randint(1, _N_HD + 1, _N_TICKETS)
    t_addr = rng.randint(1, _N_ADDR + 1, _N_TICKETS)
    t_store = rng.randint(1, _N_STORE + 1, _N_TICKETS)

    item_sk = rng.randint(1, _N_ITEM + 1, n_ss)
    promo = rng.randint(1, _N_PROMO + 1, n_ss)
    qty = rng.randint(1, 101, n_ss)
    wholesale_c = rng.randint(100, 7000, n_ss)              # cents
    list_c = wholesale_c + rng.randint(50, 3000, n_ss)
    disc_pct = rng.randint(0, 100, n_ss)
    sales_c = list_c * (100 - disc_pct) // 100
    ext_sales = qty * sales_c
    ext_wholesale = qty * wholesale_c
    ext_list = qty * list_c
    ext_disc = ext_list - ext_sales
    coupon = np.where(rng.random_sample(n_ss) < 0.1,
                      ext_sales * rng.randint(0, 30, n_ss) // 100, 0)
    net_paid = ext_sales - coupon
    tax = net_paid * rng.randint(0, 9, n_ss) // 100
    net_paid_inc_tax = net_paid + tax
    net_profit = net_paid - ext_wholesale
    _write(d, "store_sales", {
        "ss_sold_date_sk": _maybe_null(rng, np.repeat(t_date, lines_per_ticket), 0.02),
        "ss_sold_time_sk": np.repeat(t_time, lines_per_ticket),
        "ss_item_sk": item_sk,
        "ss_customer_sk": _maybe_null(rng, np.repeat(t_cust, lines_per_ticket), 0.02),
        "ss_cdemo_sk": _maybe_null(rng, np.repeat(t_cdemo, lines_per_ticket), 0.02),
        "ss_hdemo_sk": _maybe_null(rng, np.repeat(t_hdemo, lines_per_ticket), 0.02),
        "ss_addr_sk": _maybe_null(rng, np.repeat(t_addr, lines_per_ticket), 0.02),
        "ss_store_sk": _maybe_null(rng, np.repeat(t_store, lines_per_ticket), 0.02),
        "ss_promo_sk": _maybe_null(rng, promo, 0.02),
        "ss_ticket_number": ticket,
        "ss_quantity": qty,
        "ss_wholesale_cost": _dec(wholesale_c),
        "ss_list_price": _dec(list_c),
        "ss_sales_price": _dec(sales_c),
        "ss_ext_discount_amt": _dec(ext_disc),
        "ss_ext_sales_price": _dec(ext_sales),
        "ss_ext_wholesale_cost": _dec(ext_wholesale),
        "ss_ext_list_price": _dec(ext_list),
        "ss_ext_tax": _dec(tax),
        "ss_coupon_amt": _dec(coupon),
        "ss_net_paid": _dec(net_paid),
        "ss_net_paid_inc_tax": _dec(net_paid_inc_tax),
        "ss_net_profit": _dec(net_profit),
    })

    # ---- store_returns (correlated subset of store_sales lines) ---------
    ret_idx = rng.choice(n_ss, _N_SR, replace=False)
    ss_date_full = np.repeat(t_date, lines_per_ticket)
    ss_cust_full = np.repeat(t_cust, lines_per_ticket)
    sr_ret_date = ss_date_full[ret_idx] + rng.randint(1, 90, _N_SR)
    sr_ret_date = np.minimum(sr_ret_date, _BASE_DATE_SK + _N_DAYS - 1)
    sr_qty = np.maximum(1, qty[ret_idx] * rng.randint(10, 100, _N_SR) // 100)
    sr_amt = sr_qty * sales_c[ret_idx]
    sr_tax = sr_amt * rng.randint(0, 9, _N_SR) // 100
    sr_fee = rng.randint(100, 10000, _N_SR)
    sr_loss = sr_amt // 2 + sr_fee
    _write(d, "store_returns", {
        "sr_returned_date_sk": _maybe_null(rng, sr_ret_date, 0.02),
        "sr_return_time_sk": rng.randint(8 * 3600, 22 * 3600, _N_SR),
        "sr_item_sk": item_sk[ret_idx],
        "sr_customer_sk": _maybe_null(rng, ss_cust_full[ret_idx], 0.02),
        "sr_cdemo_sk": rng.randint(1, n_cd + 1, _N_SR),
        "sr_hdemo_sk": rng.randint(1, _N_HD + 1, _N_SR),
        "sr_addr_sk": rng.randint(1, _N_ADDR + 1, _N_SR),
        "sr_store_sk": _maybe_null(
            rng, np.repeat(t_store, lines_per_ticket)[ret_idx], 0.02),
        "sr_reason_sk": rng.randint(1, 36, _N_SR),
        "sr_ticket_number": ticket[ret_idx],
        "sr_return_quantity": sr_qty,
        "sr_return_amt": _dec(sr_amt),
        "sr_return_tax": _dec(sr_tax),
        "sr_return_amt_inc_tax": _dec(sr_amt + sr_tax),
        "sr_fee": _dec(sr_fee),
        "sr_return_ship_cost": _dec(sr_fee // 2),
        "sr_refunded_cash": _dec(sr_amt * 8 // 10),
        "sr_reversed_charge": _dec(sr_amt // 10),
        "sr_store_credit": _dec(sr_amt // 10),
        "sr_net_loss": _dec(sr_loss),
    })

    # ---- catalog_sales / web_sales --------------------------------------
    def channel_sales(n: int, prefix: str, extra: dict) -> tuple[dict, dict]:
        sold = _BASE_DATE_SK + rng.randint(0, _SALES_DAYS, n)
        ship = sold + rng.randint(1, 61, n)
        q = rng.randint(1, 101, n)
        wc = rng.randint(100, 7000, n)
        lc = wc + rng.randint(50, 3000, n)
        sc = lc * (100 - rng.randint(0, 100, n)) // 100
        ext_s = q * sc
        ext_w = q * wc
        ext_l = q * lc
        ship_cost = q * rng.randint(10, 500, n)
        coup = np.where(rng.random_sample(n) < 0.1,
                        ext_s * rng.randint(0, 30, n) // 100, 0)
        cols = {
            f"{prefix}_sold_date_sk": _maybe_null(rng, sold, 0.02),
            f"{prefix}_sold_time_sk": rng.randint(0, 86400, n),
            f"{prefix}_ship_date_sk": _maybe_null(rng, ship, 0.02),
            f"{prefix}_item_sk": rng.randint(1, _N_ITEM + 1, n),
            f"{prefix}_promo_sk": _maybe_null(
                rng, rng.randint(1, _N_PROMO + 1, n), 0.02),
            # ~2 lines per order: the multi-line structure q16/q94-style
            # same-order-different-warehouse EXISTS subqueries probe
            f"{prefix}_order_number": np.arange(n) // 2 + 1,
            f"{prefix}_quantity": q,
            f"{prefix}_wholesale_cost": _dec(wc),
            f"{prefix}_list_price": _dec(lc),
            f"{prefix}_sales_price": _dec(sc),
            f"{prefix}_ext_discount_amt": _dec(ext_l - ext_s),
            f"{prefix}_ext_sales_price": _dec(ext_s),
            f"{prefix}_ext_wholesale_cost": _dec(ext_w),
            f"{prefix}_ext_list_price": _dec(ext_l),
            f"{prefix}_ext_ship_cost": _dec(ship_cost),
            f"{prefix}_coupon_amt": _dec(coup),
            f"{prefix}_net_paid": _dec(ext_s - coup),
            f"{prefix}_net_profit": _dec(ext_s - coup - ext_w),
        }
        cols.update(extra(n))
        return cols, {"sold": sold, "q": q, "sc": sc}

    # repeat-customer correlation: 30% of catalog orders are by a
    # (customer, item) pair that also appears in store_sales — without it
    # the cross-channel queries (q25/q29/q97 family) match ~nothing at
    # this scale
    cs_pair_src = rng.choice(n_ss, _N_CS)
    cs_copy = rng.random_sample(_N_CS) < 0.3
    cs_cols, cs_raw = channel_sales(_N_CS, "cs", lambda n: {
        "cs_bill_customer_sk": _maybe_null(
            rng,
            np.where(cs_copy, ss_cust_full[cs_pair_src],
                     rng.randint(1, _N_CUSTOMER + 1, n)),
            0.02),
        "cs_bill_cdemo_sk": rng.randint(1, n_cd + 1, n),
        "cs_bill_hdemo_sk": rng.randint(1, _N_HD + 1, n),
        "cs_bill_addr_sk": rng.randint(1, _N_ADDR + 1, n),
        "cs_ship_customer_sk": rng.randint(1, _N_CUSTOMER + 1, n),
        "cs_ship_addr_sk": rng.randint(1, _N_ADDR + 1, n),
        "cs_ship_mode_sk": rng.randint(1, 21, n),
        "cs_call_center_sk": rng.randint(1, 7, n),
        "cs_catalog_page_sk": rng.randint(1, 101, n),
        "cs_warehouse_sk": _maybe_null(
            rng, rng.randint(1, _N_WAREHOUSE + 1, n), 0.02),
    })
    cs_cols["cs_item_sk"] = np.where(
        cs_copy, item_sk[cs_pair_src], cs_cols["cs_item_sk"])
    _write(d, "catalog_sales", cs_cols)
    ws_cols, ws_raw = channel_sales(_N_WS, "ws", lambda n: {
        "ws_bill_customer_sk": _maybe_null(
            rng, rng.randint(1, _N_CUSTOMER + 1, n), 0.02),
        "ws_bill_addr_sk": rng.randint(1, _N_ADDR + 1, n),
        "ws_ship_hdemo_sk": rng.randint(1, _N_HD + 1, n),
        "ws_ship_customer_sk": rng.randint(1, _N_CUSTOMER + 1, n),
        "ws_ship_addr_sk": rng.randint(1, _N_ADDR + 1, n),
        "ws_web_site_sk": rng.randint(1, 11, n),
        "ws_web_page_sk": rng.randint(1, 61, n),
        "ws_ship_mode_sk": rng.randint(1, 21, n),
        "ws_warehouse_sk": _maybe_null(
            rng, rng.randint(1, _N_WAREHOUSE + 1, n), 0.02),
    })
    _write(d, "web_sales", ws_cols)

    # ---- catalog_returns / web_returns (correlated samples) -------------
    def channel_returns(
        name: str, prefix: str, n_ret: int, sales_cols: dict, raw: dict,
        extra: dict,
    ) -> None:
        n_sales = len(raw["q"])
        ridx = rng.choice(n_sales, n_ret, replace=False)
        ret_date = raw["sold"][ridx] + rng.randint(1, 90, n_ret)
        ret_date = np.minimum(ret_date, _BASE_DATE_SK + _N_DAYS - 1)
        rq = np.maximum(
            1, raw["q"][ridx] * rng.randint(10, 100, n_ret) // 100)
        ramt = rq * raw["sc"][ridx]
        rtax = ramt * rng.randint(0, 9, n_ret) // 100
        fee = rng.randint(100, 10000, n_ret)
        cols = {
            f"{prefix}_returned_date_sk": _maybe_null(rng, ret_date, 0.02),
            f"{prefix}_returned_time_sk": rng.randint(0, 86400, n_ret),
            f"{prefix}_item_sk": np.asarray(
                sales_cols[f"{prefix[0]}s_item_sk"])[ridx],
            f"{prefix}_order_number": np.asarray(
                sales_cols[f"{prefix[0]}s_order_number"])[ridx],
            f"{prefix}_reason_sk": rng.randint(1, 36, n_ret),
            f"{prefix}_return_quantity": rq,
            f"{prefix}_return_amt": _dec(ramt),
            f"{prefix}_return_tax": _dec(rtax),
            f"{prefix}_return_amt_inc_tax": _dec(ramt + rtax),
            f"{prefix}_fee": _dec(fee),
            f"{prefix}_return_ship_cost": _dec(fee // 2),
            f"{prefix}_refunded_cash": _dec(ramt * 8 // 10),
            f"{prefix}_reversed_charge": _dec(ramt // 10),
            f"{prefix}_store_credit": _dec(ramt // 10),
            f"{prefix}_net_loss": _dec(ramt // 2 + fee),
        }
        cols.update(extra(n_ret))
        if prefix == "cr":
            # the spec's naming inconsistency is part of the schema:
            # catalog_returns has cr_return_AMOUNT (but cr_return_amt_inc_tax)
            cols["cr_return_amount"] = cols.pop("cr_return_amt")
        _write(d, name, cols)

    channel_returns("catalog_returns", "cr", _N_CH_RET, cs_cols, cs_raw, lambda n: {
        "cr_returning_customer_sk": _maybe_null(
            rng, rng.randint(1, _N_CUSTOMER + 1, n), 0.02),
        "cr_refunded_customer_sk": rng.randint(1, _N_CUSTOMER + 1, n),
        "cr_returning_addr_sk": rng.randint(1, _N_ADDR + 1, n),
        "cr_refunded_addr_sk": rng.randint(1, _N_ADDR + 1, n),
        "cr_call_center_sk": rng.randint(1, 7, n),
        "cr_catalog_page_sk": rng.randint(1, 101, n),
    })
    def wr_extra(n: int) -> dict:
        refunded_cd = rng.randint(1, n_cd + 1, n)
        # the returning party is usually the refunded party (the q85-family
        # cd1 = cd2 attribute-equality predicates probe this)
        returning_cd = np.where(
            rng.random_sample(n) < 0.5, refunded_cd,
            rng.randint(1, n_cd + 1, n),
        )
        return {
            "wr_returning_customer_sk": _maybe_null(
                rng, rng.randint(1, _N_CUSTOMER + 1, n), 0.02),
            "wr_refunded_customer_sk": rng.randint(1, _N_CUSTOMER + 1, n),
            "wr_returning_addr_sk": rng.randint(1, _N_ADDR + 1, n),
            "wr_refunded_addr_sk": rng.randint(1, _N_ADDR + 1, n),
            "wr_refunded_cdemo_sk": refunded_cd,
            "wr_returning_cdemo_sk": returning_cd,
            "wr_web_page_sk": rng.randint(1, 61, n),
        }

    channel_returns("web_returns", "wr", _N_CH_RET, ws_cols, ws_raw, wr_extra)

    # ---- inventory (weekly snapshots) -----------------------------------
    # full weekly (item x warehouse) grid, like the real table: every
    # tracked item has a snapshot in every warehouse every week — the
    # month-over-month same-pair joins (q39) need the pair to persist
    week_dates = np.array(
        [_BASE_DATE_SK + i for i in range(0, _SALES_DAYS, 7)])
    inv_items = rng.choice(np.arange(1, _N_ITEM + 1), _N_INV_ITEMS,
                           replace=False)
    pair_item = np.tile(inv_items, _N_WAREHOUSE)
    pair_wh = np.repeat(np.arange(1, _N_WAREHOUSE + 1), _N_INV_ITEMS)
    grid_date = np.repeat(week_dates, len(pair_item))
    grid_item = np.tile(pair_item, len(week_dates))
    grid_wh = np.tile(pair_wh, len(week_dates))
    n_inv_base = len(grid_date)
    _write(d, "inventory", {
        "inv_date_sk": grid_date,
        "inv_item_sk": grid_item,
        "inv_warehouse_sk": grid_wh,
        "inv_quantity_on_hand": _maybe_null(
            rng, rng.randint(0, 1001, n_inv_base), 0.03),
    })
