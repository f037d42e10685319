"""Colour-composite operators (image_analysis) over single-band cell tables.

References (reference = depowered/whitebox-tools):
  - RgbToIhs: image_analysis/rgb_to_ihs.rs:810-830 — bands normalized to
    [0,1] by their own min/max, then i=(r+g+b)/3, h from the acos chromatic
    formula (b>g mirrored to 2pi-h), s=1-3*min(rn,gn,bn).
  - IhsToRgb: image_analysis/ihs_to_rgb.rs:640-681 — piecewise inverse on
    thirds of the hue circle, *255 rounded and clamped.
  - CreateColourComposite: image_analysis/create_colour_composite.rs:380-424
    — per-band (v-min)/range*255 clamped, truncated, packed
    (a<<24)|(b<<16)|(g<<8)|r.
  - SplitColourComposite: the unpack of the same layout.
  - ChangeVectorAnalysis: image_analysis/change_vector_analysis.rs:266-365 —
    magnitude = sqrt(sum_b (z2-z1)^2), direction code = sum over bands with
    nonneg change of 2^band_index.

All are per-cell ZIP joins / per-band aggregates — embarrassingly parallel.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm(df: DataFrame, name: str) -> DataFrame:
    """(row, col, <name>) normalized to [0,1] by the band's min/max."""
    src = df.filter(F.col("value").isNotNull()).select("row", "col", "value")
    s = src.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    return src.crossJoin(F.broadcast(s)).select(
        "row", "col",
        ((F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn"))).alias(name),
    )


_H_EXPR = (
    "CASE WHEN rn <> gn OR rn <> bn THEN "
    "acos((0.5 * ((rn - gn) + (rn - bn))) / "
    "sqrt((rn - gn) * (rn - gn) + (rn - bn) * (gn - bn))) "
    "ELSE 0.0 END"
)


def rgb_to_ihs(r: DataFrame, g: DataFrame, b: DataFrame) -> DataFrame:
    """-> (row, col, intensity, hue, saturation)."""
    j = (
        _norm(r, "r").join(_norm(g, "g"), ["row", "col"])
        .join(_norm(b, "b"), ["row", "col"])
        .withColumn("rn", F.col("r") / (F.col("r") + F.col("g") + F.col("b")))
        .withColumn("gn", F.col("g") / (F.col("r") + F.col("g") + F.col("b")))
        .withColumn("bn", F.col("b") / (F.col("r") + F.col("g") + F.col("b")))
    )
    h0 = F.expr(_H_EXPR)
    h = F.when(F.col("b") > F.col("g"), F.lit(2.0 * math.pi) - h0).otherwise(h0)
    return j.select(
        "row", "col",
        ((F.col("r") + F.col("g") + F.col("b")) / 3.0).alias("intensity"),
        h.alias("hue"),
        (F.lit(1.0) - 3.0 * F.least("rn", "gn", "bn")).alias("saturation"),
    )


def rgb_to_ihs_oracle_sql(r_sql: str, g_sql: str, b_sql: str) -> str:
    def norm(src, name):
        return f"""
{name}0 AS (SELECT row, col, value FROM ({src}) WHERE value IS NOT NULL),
{name}s AS (SELECT min(value) AS mn, max(value) AS mx FROM {name}0),
{name}n AS (SELECT row, col, (value - mn) / (mx - mn) AS {name} FROM {name}0, {name}s)"""

    return f"""
WITH {norm(r_sql, "r")}, {norm(g_sql, "g")}, {norm(b_sql, "b")},
j AS (
  SELECT rn.row, rn.col, rn.r, gn.g, bn.b,
         rn.r / (rn.r + gn.g + bn.b) AS rn,
         gn.g / (rn.r + gn.g + bn.b) AS gn,
         bn.b / (rn.r + gn.g + bn.b) AS bn
  FROM rn JOIN gn ON gn.row = rn.row AND gn.col = rn.col
          JOIN bn ON bn.row = rn.row AND bn.col = rn.col
),
h AS (SELECT row, col, r, g, b, rn, gn, bn, {_H_EXPR} AS h0 FROM j)
SELECT row, col, (r + g + b) / 3.0 AS intensity,
       CASE WHEN b > g THEN 2.0 * pi() - h0 ELSE h0 END AS hue,
       1.0 - 3.0 * least(rn, gn, bn) AS saturation
FROM h
"""


def _hsi_branch(hshift: str):
    """(x, y, z) component expressions for one third of the hue circle,
    with h already shifted into [0, 2pi/3)."""
    y = f"(i * (1.0 + (s * cos({hshift})) / cos(pi() / 3.0 - ({hshift}))))"
    return y


def ihs_to_rgb(ihs: DataFrame) -> DataFrame:
    """Input (row, col, intensity, hue, saturation) -> (row, col, r, g, b)
    as 0-255 rounded/clamped doubles."""
    third = 2.0 * math.pi / 3.0
    x = "(i * (1.0 - s))"

    def clamp(e):
        return f"least(greatest(round(round({e}, 9) * 255.0), 0.0), 255.0)"

    def branch(shift):
        y = _hsi_branch(f"h - {shift!r}")
        z = f"(3.0 * i - ({x} + {y}))"
        return x, y, z

    x1, y1, z1 = branch(0.0)
    x2, y2, z2 = branch(third)
    x3, y3, z3 = branch(2.0 * third)
    r = (
        f"CASE WHEN h < {third!r} THEN {clamp(y1)} "
        f"WHEN h < {2.0 * third!r} THEN {clamp(x2)} ELSE {clamp(z3)} END"
    )
    g = (
        f"CASE WHEN h < {third!r} THEN {clamp(z1)} "
        f"WHEN h < {2.0 * third!r} THEN {clamp(y2)} ELSE {clamp(x3)} END"
    )
    b = (
        f"CASE WHEN h < {third!r} THEN {clamp(x1)} "
        f"WHEN h < {2.0 * third!r} THEN {clamp(z2)} ELSE {clamp(y3)} END"
    )
    j = ihs.select(
        "row", "col",
        F.col("intensity").alias("i"), F.col("hue").alias("h"),
        F.col("saturation").alias("s"),
    )
    return j.select(
        "row", "col",
        F.expr(r).alias("r"), F.expr(g).alias("g"), F.expr(b).alias("b"),
    )


def ihs_to_rgb_oracle_sql(ihs_sql: str) -> str:
    third = 2.0 * math.pi / 3.0
    x = "(i * (1.0 - s))"

    def clamp(e):
        return f"least(greatest(round(round({e}, 9) * 255.0), 0.0), 255.0)"

    def branch(shift):
        y = _hsi_branch(f"h - {shift!r}")
        z = f"(3.0 * i - ({x} + {y}))"
        return x, y, z

    x1, y1, z1 = branch(0.0)
    x2, y2, z2 = branch(third)
    x3, y3, z3 = branch(2.0 * third)
    return f"""
WITH ihs AS (SELECT row, col, intensity AS i, hue AS h, saturation AS s
             FROM ({ihs_sql}) t)
SELECT row, col,
       CASE WHEN h < {third!r} THEN {clamp(y1)}
            WHEN h < {2.0 * third!r} THEN {clamp(x2)} ELSE {clamp(z3)} END AS r,
       CASE WHEN h < {third!r} THEN {clamp(z1)}
            WHEN h < {2.0 * third!r} THEN {clamp(y2)} ELSE {clamp(x3)} END AS g,
       CASE WHEN h < {third!r} THEN {clamp(x1)}
            WHEN h < {2.0 * third!r} THEN {clamp(z2)} ELSE {clamp(y3)} END AS b
FROM ihs
"""


def _chan255(df: DataFrame, name: str) -> DataFrame:
    """(row, col, <name>) as 0-255 truncated ints, (v-min)/range*255 clamped."""
    src = df.filter(F.col("value").isNotNull()).select("row", "col", "value")
    s = src.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    v = (F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 255.0
    return src.crossJoin(F.broadcast(s)).select(
        "row", "col",
        F.floor(F.least(F.greatest(v, F.lit(0.0)), F.lit(255.0))).cast("long").alias(name),
    )


def create_colour_composite(
    r: DataFrame, g: DataFrame, b: DataFrame, a: DataFrame | None = None
) -> DataFrame:
    """-> (row, col, value) with value = (a<<24)|(b<<16)|(g<<8)|r as double."""
    j = (
        _chan255(r, "r").join(_chan255(g, "g"), ["row", "col"])
        .join(_chan255(b, "b"), ["row", "col"])
    )
    if a is not None:
        j = j.join(_chan255(a, "a"), ["row", "col"])
        av = F.col("a")
    else:
        av = F.lit(255).cast("long")
    packed = (
        F.shiftleft(av, 24) + F.shiftleft(F.col("b"), 16)
        + F.shiftleft(F.col("g"), 8) + F.col("r")
    )
    return j.select("row", "col", packed.cast("double").alias("value"))


def composite_oracle_sql(r_sql: str, g_sql: str, b_sql: str) -> str:
    def chan(src, name):
        return f"""
{name}0 AS (SELECT row, col, value FROM ({src}) WHERE value IS NOT NULL),
{name}s AS (SELECT min(value) AS mn, max(value) AS mx FROM {name}0),
{name}c AS (SELECT row, col,
            CAST(floor(least(greatest((value - mn) / (mx - mn) * 255.0, 0.0), 255.0)) AS BIGINT) AS {name}
            FROM {name}0, {name}s)"""

    return f"""
WITH {chan(r_sql, "r")}, {chan(g_sql, "g")}, {chan(b_sql, "b")}
SELECT rc.row, rc.col,
       CAST(CAST(255 AS BIGINT) * 16777216 + bc.b * 65536 + gc.g * 256 + rc.r AS DOUBLE) AS value
FROM rc JOIN gc ON gc.row = rc.row AND gc.col = rc.col
        JOIN bc ON bc.row = rc.row AND bc.col = rc.col
"""


def split_colour_composite(comp: DataFrame) -> DataFrame:
    """-> (row, col, r, g, b, a) unpacked from the packed composite."""
    v = F.col("value").cast("long")
    return comp.filter(F.col("value").isNotNull()).select(
        "row", "col",
        (v % 256).cast("double").alias("r"),
        (F.floor(v / 256) % 256).cast("double").alias("g"),
        (F.floor(v / 65536) % 256).cast("double").alias("b"),
        (F.floor(v / 16777216) % 256).cast("double").alias("a"),
    )


def split_composite_oracle_sql(comp_sql: str) -> str:
    return f"""
SELECT row, col,
       CAST(CAST(value AS BIGINT) % 256 AS DOUBLE) AS r,
       CAST((CAST(value AS BIGINT) // 256) % 256 AS DOUBLE) AS g,
       CAST((CAST(value AS BIGINT) // 65536) % 256 AS DOUBLE) AS b,
       CAST((CAST(value AS BIGINT) // 16777216) % 256 AS DOUBLE) AS a
FROM ({comp_sql}) t WHERE value IS NOT NULL
"""


def change_vector_analysis(date1: DataFrame, date2: DataFrame) -> DataFrame:
    """Inputs are multi-band cell tables (band, row, col, value), band
    indices 0-based -> (row, col, magnitude, direction)."""
    j = (
        date1.filter(F.col("value").isNotNull())
        .select("band", "row", "col", F.col("value").alias("z1"))
        .join(
            date2.filter(F.col("value").isNotNull())
            .select("band", "row", "col", F.col("value").alias("z2")),
            ["band", "row", "col"],
        )
        .select(
            "row", "col",
            (F.col("z2") - F.col("z1")).alias("d"),
            F.pow(F.lit(2.0), F.col("band").cast("double")).alias("code"),
        )
    )
    return j.groupBy("row", "col").agg(
        F.sqrt(F.sum(F.col("d") * F.col("d"))).alias("magnitude"),
        F.sum(F.when(F.col("d") >= 0.0, F.col("code")).otherwise(0.0)).alias("direction"),
    )


def cva_oracle_sql(date1_sql: str, date2_sql: str) -> str:
    return f"""
WITH a AS (SELECT band, row, col, value FROM ({date1_sql}) WHERE value IS NOT NULL),
b AS (SELECT band, row, col, value FROM ({date2_sql}) WHERE value IS NOT NULL),
d AS (SELECT a.row, a.col, b.value - a.value AS d, power(2.0, a.band) AS code
      FROM a JOIN b ON b.band = a.band AND b.row = a.row AND b.col = a.col)
SELECT row, col, sqrt(sum(d * d)) AS magnitude,
       sum(CASE WHEN d >= 0.0 THEN code ELSE 0.0 END) AS direction
FROM d GROUP BY row, col
"""


def _unpack(comp: DataFrame):
    v = F.col("value").cast("long")
    return (
        comp.filter(F.col("value").isNotNull())
        .select(
            "row", "col",
            (v % 256).alias("r"),
            ((v / 256).cast("long") % 256).alias("g"),
            ((v / 65536).cast("long") % 256).alias("b"),
            ((v / 16777216).cast("long") % 256).alias("a"),
        )
    )


def balance_contrast_enhancement(
    comp: DataFrame, *, band_mean: float = 100.0
) -> DataFrame:
    """BalanceContrastEnhancement (image_analysis/
    balance_contrast_enhancement.rs:370-450, Liu 1991): per band of the
    packed composite, the parabola y = a(x-b)^2 + c whose output min/max/
    mean are (0, 255, E); coefficients from the band's min (l), max (h),
    mean (e) and mean square (s). Output repacked with the input alpha."""
    e_out = float(band_mean)
    u = _unpack(comp)
    stats = u.agg(
        *[
            agg(c).alias(f"{c}_{n}")
            for c in ("r", "g", "b")
            for n, agg in (
                ("l", F.min),
                ("h", F.max),
                ("e", F.avg),
                ("s", lambda col: F.avg(F.col(col) * F.col(col))),
            )
        ]
    )
    j = u.crossJoin(F.broadcast(stats))

    def band_out(c):
        lo, hi = F.lit(0.0), F.lit(255.0)
        bl = F.col(f"{c}_l").cast("double")
        bh = F.col(f"{c}_h").cast("double")
        be = F.col(f"{c}_e")
        bs = F.col(f"{c}_s")
        bb = (
            bh * bh * (F.lit(e_out) - lo) - bs * (hi - lo) + bl * bl * (hi - F.lit(e_out))
        ) / (2.0 * (bh * (F.lit(e_out) - lo) - be * (hi - lo) + bl * (hi - F.lit(e_out))))
        ba = (hi - lo) / ((bh - bl) * (bh + bl - 2.0 * bb))
        bc = lo - ba * ((bl - bb) * (bl - bb))
        x = F.col(c).cast("double")
        y = ba * (x - bb) * (x - bb) + bc
        return F.floor(F.least(F.greatest(y, F.lit(0.0)), F.lit(255.0))).cast("long")

    return j.select(
        "row", "col",
        (
            F.col("a") * 16777216 + band_out("b") * 65536
            + band_out("g") * 256 + band_out("r")
        ).cast("double").alias("value"),
    )


def bce_oracle_sql(comp_sql: str, *, band_mean: float = 100.0) -> str:
    e = float(band_mean)
    bands = ""
    for c in ("r", "g", "b"):
        bands += f"""
{c}_bb AS (
  SELECT ({c}_h * {c}_h * ({e!r} - 0.0) - {c}_s * (255.0 - 0.0) + {c}_l * {c}_l * (255.0 - {e!r}))
       / (2.0 * ({c}_h * ({e!r} - 0.0) - {c}_e * (255.0 - 0.0) + {c}_l * (255.0 - {e!r}))) AS bb,
         {c}_l AS bl, {c}_h AS bh
  FROM st
),
{c}_co AS (
  SELECT bb, (255.0 - 0.0) / ((bh - bl) * (bh + bl - 2.0 * bb)) AS ba,
         0.0 - ((255.0 - 0.0) / ((bh - bl) * (bh + bl - 2.0 * bb)))
             * ((bl - bb) * (bl - bb)) AS bc
  FROM {c}_bb
),"""

    def out(c):
        return (
            f"CAST(floor(least(greatest("
            f"{c}_co.ba * (u.{c} - {c}_co.bb) * (u.{c} - {c}_co.bb) + {c}_co.bc"
            f", 0.0), 255.0)) AS BIGINT)"
        )

    return f"""
WITH u AS (
  SELECT row, col,
         CAST(value AS BIGINT) % 256 AS r,
         (CAST(value AS BIGINT) // 256) % 256 AS g,
         (CAST(value AS BIGINT) // 65536) % 256 AS b,
         (CAST(value AS BIGINT) // 16777216) % 256 AS a
  FROM ({comp_sql}) WHERE value IS NOT NULL
),
st AS (
  SELECT CAST(min(r) AS DOUBLE) AS r_l, CAST(max(r) AS DOUBLE) AS r_h,
         avg(r) AS r_e, avg(CAST(r AS DOUBLE) * r) AS r_s,
         CAST(min(g) AS DOUBLE) AS g_l, CAST(max(g) AS DOUBLE) AS g_h,
         avg(g) AS g_e, avg(CAST(g AS DOUBLE) * g) AS g_s,
         CAST(min(b) AS DOUBLE) AS b_l, CAST(max(b) AS DOUBLE) AS b_h,
         avg(b) AS b_e, avg(CAST(b AS DOUBLE) * b) AS b_s
  FROM u
),{bands.rstrip(",")}
SELECT u.row, u.col,
       CAST(CAST(u.a AS BIGINT) * 16777216 + {out('b')} * 65536
          + {out('g')} * 256 + {out('r')} AS DOUBLE) AS value
FROM u CROSS JOIN r_co CROSS JOIN g_co CROSS JOIN b_co
"""


def pan_sharpening_brovey(comp: DataFrame, pan: DataFrame) -> DataFrame:
    """PanchromaticSharpening, Brovey method (image_analysis/
    pan_sharpening.rs:440-505): p = clamp((pan - min)/range, 0, 1);
    band_out = clamp(band * p / ((r+g+b)/3) * 255) truncated; repacked
    with alpha 255. Pan and composite aligned on (row, col) — the
    reference resamples the MS grid onto the pan grid; the aligned case
    is the identity resample."""
    u = _unpack(comp)
    ps = pan.filter(F.col("value").isNotNull()).agg(
        F.min("value").alias("pmn"), F.max("value").alias("pmx")
    )
    p = pan.filter(F.col("value").isNotNull()).crossJoin(F.broadcast(ps)).select(
        "row", "col",
        F.least(
            F.greatest(
                (F.col("value") - F.col("pmn")) / (F.col("pmx") - F.col("pmn")),
                F.lit(0.0),
            ),
            F.lit(1.0),
        ).alias("p"),
    )
    j = u.join(p, ["row", "col"])
    adj = (F.col("r") + F.col("g") + F.col("b")).cast("double") / 3.0

    def band_out(c):
        y = F.col(c).cast("double") * F.col("p") / adj * 255.0
        return F.least(F.floor(y).cast("long"), F.lit(255))

    return j.select(
        "row", "col",
        (
            F.lit(255).cast("long") * 16777216 + band_out("b") * 65536
            + band_out("g") * 256 + band_out("r")
        ).cast("double").alias("value"),
    )


def pan_sharpening_brovey_oracle_sql(comp_sql: str, pan_sql: str) -> str:
    def out(c):
        return (
            f"least(CAST(floor(CAST({c} AS DOUBLE) * p / "
            f"(CAST(r + g + b AS DOUBLE) / 3.0) * 255.0) AS BIGINT), 255)"
        )

    return f"""
WITH u AS (
  SELECT row, col,
         CAST(value AS BIGINT) % 256 AS r,
         (CAST(value AS BIGINT) // 256) % 256 AS g,
         (CAST(value AS BIGINT) // 65536) % 256 AS b
  FROM ({comp_sql}) WHERE value IS NOT NULL
),
pp AS (SELECT row, col, value FROM ({pan_sql}) WHERE value IS NOT NULL),
ps AS (SELECT min(value) AS pmn, max(value) AS pmx FROM pp),
p AS (SELECT row, col,
             least(greatest((value - pmn) / (pmx - pmn), 0.0), 1.0) AS p
      FROM pp CROSS JOIN ps)
SELECT u.row, u.col,
       CAST(CAST(255 AS BIGINT) * 16777216 + {out('b')} * 65536 + {out('g')} * 256 + {out('r')} AS DOUBLE) AS value
FROM u JOIN p ON p.row = u.row AND p.col = u.col
"""


def direct_decorrelation_stretch(
    comp: DataFrame, *, k: float = 0.5, clip_percent: float = 0.01
) -> DataFrame:
    """DirectDecorrelationStretch (image_analysis/
    direct_decorrelation_stretch.rs:242-500, Liu & Moore 1996): subtract
    k * min(r,g,b) per pixel (clamped, truncated to u8), then a combined
    three-band percent-clip linear stretch whose bounds come from the
    reference's interleaved histogram scan (equivalent closed form: the
    extreme bin where ANY band's tail count exceeds clip). The tiny 256-bin
    histogram is collected to the driver; everything per-pixel stays in
    expressions."""
    u = _unpack(comp)
    mn = F.least("r", "g", "b").cast("double")

    def band1(c):
        y = F.col(c).cast("double") - F.lit(float(k)) * mn
        return F.floor(F.least(F.greatest(y, F.lit(0.0)), F.lit(255.0))).cast("long")

    step1 = u.select(
        "row", "col",
        band1("r").alias("r"), band1("g").alias("g"), band1("b").alias("b"),
    ).localCheckpoint(eager=True)
    n = step1.count()
    tail = int(n * float(clip_percent))
    hist = {c: [0] * 256 for c in ("r", "g", "b")}
    for c in ("r", "g", "b"):
        for rw in step1.groupBy(c).count().collect():
            hist[c][int(rw[c])] = rw["count"]
    smax = 255.0
    cnt = {c: 0 for c in hist}
    for i in range(255, -1, -1):
        hit = False
        for c in ("r", "g", "b"):
            if cnt[c] + hist[c][i] > tail:
                smax = float(i + 1)
                hit = True
                break
            cnt[c] += hist[c][i]
        if hit:
            break
    smax = min(smax, 255.0)
    smin = 0.0
    cnt = {c: 0 for c in hist}
    for i in range(256):
        hit = False
        for c in ("r", "g", "b"):
            if cnt[c] + hist[c][i] > tail:
                smin = float(i - 1) if i > 0 else 0.0
                hit = True
                break
            cnt[c] += hist[c][i]
        if hit:
            break
    rng = smax - smin

    def band2(c):
        clamped = F.least(F.greatest(F.col(c), F.lit(int(smin))), F.lit(int(smax)))
        return F.floor(
            (clamped.cast("double") - F.lit(smin)) / F.lit(rng) * 255.0
        ).cast("long")

    return step1.select(
        "row", "col",
        (
            F.lit(255).cast("long") * 16777216 + band2("b") * 65536
            + band2("g") * 256 + band2("r")
        ).cast("double").alias("value"),
    )


def image_stack_profile(
    rasters: list[DataFrame], points: DataFrame
) -> DataFrame:
    """ImageStackProfile (image_analysis/image_stack_profile.rs): sample
    every image of the stack at the given point cells.
    points: (point_id, row, col). -> (point_id, image_num, value)."""
    parts = []
    for i, df in enumerate(rasters):
        parts.append(
            points.join(df, ["row", "col"]).select(
                "point_id", F.lit(i + 1).alias("image_num"), "value"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def write_function_memory_insertion(
    date1: DataFrame, date2: DataFrame, date3: DataFrame | None = None
) -> DataFrame:
    """WriteFunctionMemoryInsertion (image_analysis/
    write_function_memory_insertion.rs): change-detection composite —
    red = date 1, green = date 2, blue = date 3 (or date 2 again),
    each min/max-scaled to bytes, packed like CreateColourComposite."""
    return create_colour_composite(
        date1, date2, date3 if date3 is not None else date2
    )


def dds_oracle_sql(comp_sql: str, *, k: float = 0.5, clip_percent: float = 0.01) -> str:
    """DuckDB mirror of direct_decorrelation_stretch: the interleaved
    histogram scan reduces to 'extreme bin where any band's running count
    exceeds the clip tail' (suffix/prefix window sums — exact equivalence
    derived in the operator docstring)."""
    band1 = (
        "CAST(floor(least(greatest(CAST({c} AS DOUBLE) - {k} * mnv, 0.0), 255.0)) AS BIGINT)"
    )
    return f"""
WITH u0 AS (
  SELECT row, col,
         CAST(value AS BIGINT) % 256 AS r,
         (CAST(value AS BIGINT) // 256) % 256 AS g,
         (CAST(value AS BIGINT) // 65536) % 256 AS b
  FROM ({comp_sql}) WHERE value IS NOT NULL
),
u AS (
  SELECT row, col,
         {band1.format(c="r", k=float(k))} AS r,
         {band1.format(c="g", k=float(k))} AS g,
         {band1.format(c="b", k=float(k))} AS b
  FROM (SELECT row, col, r, g, b, CAST(least(r, g, b) AS DOUBLE) AS mnv FROM u0)
),
tailv AS (SELECT CAST(floor(count(*) * {float(clip_percent)!r}) AS BIGINT) AS tail FROM u),
hist AS (
  SELECT 'r' AS band, r AS bin, count(*) AS cnt FROM u GROUP BY r
  UNION ALL
  SELECT 'g', g, count(*) FROM u GROUP BY g
  UNION ALL
  SELECT 'b', b, count(*) FROM u GROUP BY b
),
cums AS (
  SELECT band, bin,
         SUM(cnt) OVER (PARTITION BY band ORDER BY bin DESC) AS suf,
         SUM(cnt) OVER (PARTITION BY band ORDER BY bin ASC) AS pre
  FROM hist
),
bounds AS (
  SELECT least(coalesce((SELECT max(bin) + 1 FROM cums, tailv WHERE suf > tail), 255), 255) AS smax,
         coalesce((SELECT CASE WHEN min(bin) > 0 THEN min(bin) - 1 ELSE 0 END
                   FROM cums, tailv WHERE pre > tail), 0) AS smin
)
SELECT row, col,
       CAST(CAST(255 AS BIGINT) * 16777216
          + CAST(floor((CAST(least(greatest(b, smin), smax) AS DOUBLE) - smin)
                 / (smax - smin) * 255.0) AS BIGINT) * 65536
          + CAST(floor((CAST(least(greatest(g, smin), smax) AS DOUBLE) - smin)
                 / (smax - smin) * 255.0) AS BIGINT) * 256
          + CAST(floor((CAST(least(greatest(r, smin), smax) AS DOUBLE) - smin)
                 / (smax - smin) * 255.0) AS BIGINT)
        AS DOUBLE) AS value
FROM u CROSS JOIN bounds
"""
