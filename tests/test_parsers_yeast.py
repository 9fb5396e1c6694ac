"""Golden tests for the SGD + yeast parser families (round-4 verdict ask
#3: parsers/SGD/ and parsers/yeast/ get dedicated families; reference
semantics cited per function in plans/parsers.py)."""

from orion_spark.plans import parsers as PP


SGD_GENES_CSV = """\
primaryIdentifier,secondaryIdentifier,symbol,namesake,protein,description,chrom,start,end,strand,organism,featureType,link
SGD:S000001,YAL001C,TFC3,ns,p,d,chrI,100,400,1,S. cerevisiae,ORF,http://x/1
SGD:S000002,YAL002W,?,ns,p,d,chrI,350,600,-1,S. cerevisiae,ORF,http://x/2
SGD:S 000003,YAL003W,VMA1,ns,p,d,chrII,50,80,1,S. cerevisiae,ORF,http://x/3
"""

SGD_GO_CSV = """\
c0,c1,c2,c3,c4,c5,c6,c7,c8,c9,c10,c11,c12,c13,c14,c15,c16
SGD:S000001,x,x,x,x,GO:1,go one,x,IDA,involved in,ev,x,manual,x,x,123,x
SGD:S000002,x,x,x,x,GO:2,go two,x,IEA,is active in,ev,x,auto,x,x,?,x
SGD:S000003,x,x,x,x,GO:3,go three,x,IDA,part of,ev,x,manual,x,x,456,x
"""

SGD_PW_CSV = """\
c0,c1,c2,c3,c4
SGD:S000001,S. cerevisiae,PW:9,glycolysis,link
"""

SGD_PH_CSV = """\
c0,c1,c2,c3,c4,c5,c6,c7,c8,c9,c10,c11,c12,c13,c14,c15,c16,c17,c18,c19
SGD:S000001,x,x,x,x,exp,mut,pretty name,qual,al,ad,bg,chem,cond,det,789,x,x,heat sensitivity,plink
"""

SGD_CX_CSV = """\
c0,c1,c2,c3,c4,c5,c6,c7,c8,c9,c10,c11
cplx one,fn,sys,x,x,role,2,protein,x,props,CPX9,SGD:S000001
"""

SGD_CG_CSV = """\
c0,c1,c2,c3
CPX9,GO:4,cplx one,biolink:enables
"""


def _write_sgd(tmp_path):
    files = {
        "genes": SGD_GENES_CSV, "gene2go": SGD_GO_CSV,
        "gene2pathway": SGD_PW_CSV, "gene2phenotype": SGD_PH_CSV,
        "gene2complex": SGD_CX_CSV, "complex2go": SGD_CG_CSV,
    }
    paths = {}
    for name, text in files.items():
        p = tmp_path / f"{name}.csv"
        p.write_text(text)
        paths[name] = str(p)
    return paths


def test_sgd_like_golden(spark, tmp_path):
    p = _write_sgd(tmp_path)
    nodes, edges = PP.sgd_like(
        spark, p["genes"], p["gene2go"], p["gene2pathway"],
        p["gene2phenotype"], p["gene2complex"], p["complex2go"],
    )
    n = {r.id: r for r in nodes.collect()}
    # name falls back to the secondary id when symbol is '?'
    assert n["SGD:S000002"].name == "YAL002W"
    # spaces in the gene id are underscored (loadSGD.py:151)
    assert "SGD:S_000003" in n
    assert n["SGD:S000001"].props["chromosomeLocation"] == (
        "chrI:100-400, strand: 1")
    # object nodes from every edge file
    assert n["PW:9"].category == ["biolink:Pathway"]
    assert n["PW:9"].props["taxon"] == "NCBI_Taxon:559292"
    assert n["heat_sensitivity"].name == "pretty name"
    assert n["CPX:CPX9"].props["referenceLink"].endswith("/complex/CPX9")
    assert n["GO:1"].name == "go one"

    e = {(r.subject, r.object): r for r in edges.collect()}
    assert len(e) == 7  # 3 GO + 1 pathway + 1 phenotype + 1 complex + 1 cplx-GO
    # qualifier mapping: two mapped, one passthrough
    assert e[("SGD:S000001", "GO:1")].predicate == "biolink:actively_involved_in"
    assert e[("SGD:S000002", "GO:2")].predicate == "biolink:active_in"
    assert e[("SGD:S000003", "GO:3")].predicate == "part of"
    # '?'-gated publications
    assert e[("SGD:S000001", "GO:1")].publications == ["PMID:123"]
    assert e[("SGD:S000002", "GO:2")].publications == []
    assert e[("SGD:S000001", "heat_sensitivity")].props["mutantType"] == "mut"
    assert e[("SGD:S000001", "CPX:CPX9")].props["geneStoichiometry"] == "2"
    assert e[("CPX:CPX9", "GO:4")].predicate == "biolink:enables"


COSTANZA_CSV = (
    ",".join(f"c{i}" for i in range(22)) + "\n"
    + "G1,x,x,x,x,x,x,x,111,x,x,x,x,x,Negative Genetic,x,x,0.5,1.5,a1,a2,G2\n"
    + "G3,x,x,x,x,x,x,x,222,x,x,x,x,x,Positive Genetic,x,x,0.25,2.5,b1,b2,G4\n"
    + "G5,x,x,x,x,x,x,x,333,x,x,x,x,x,Dosage Rescue,x,x,0.75,3.5,d1,d2,G6\n"
)


def test_costanza_like_golden(spark, tmp_path):
    p = tmp_path / "costanza.csv"
    p.write_text(COSTANZA_CSV)
    nodes, edges = PP.costanza_like(spark, str(p))
    rows = edges.collect()
    # 2 mapped fitness edges + 3 rows x 2 has_part edges
    assert len(rows) == 8
    fitness = {r.subject: r for r in rows if r.object == "APO:0000216"}
    assert set(fitness) == {"SGD:G1-G2", "SGD:G3-G4"}
    assert fitness["SGD:G1-G2"].predicate == "biolink:negatively_correlated_with"
    assert fitness["SGD:G3-G4"].predicate == "biolink:positively_correlated_with"
    assert fitness["SGD:G1-G2"].publications == ["PMID:111"]
    # the unmapped-method row keeps its has_part edges
    parts = {(r.subject, r.object) for r in rows
             if r.predicate == "biolink:has_part"}
    assert ("SGD:G5-G6", "SGD:G5") in parts and ("SGD:G5-G6", "SGD:G6") in parts
    n = {r.id: r for r in nodes.collect()}
    assert n["SGD:G1-G2"].name == "a1-a2"
    assert n["SGD:G1-G2"].category == ["biolink:Genotype"]


def test_yeast_histone_bins_windows(spark):
    genome = spark.createDataFrame(
        [("chrA", 400), ("chrB", 100)], "chrom string, length bigint")
    bins = PP.yeast_histone_bins(
        spark, genome=genome, ptms=["H3K4me"], resolution=150)
    got = sorted((r.chromosome_id, r.start, r.end) for r in bins.collect())
    # chrA: regular windows end at multiples of 150 <= 399 -> 150, 300;
    # tail starts at (400 // 9) * 9 + 1 = 397 (reference's hardcoded 9,
    # loadHistoneMap.py:297). chrB (< resolution): tail only, (100//9)*9+1=100.
    assert got == [
        ("chrA", 1, 150), ("chrA", 151, 300), ("chrA", 397, 400),
        ("chrB", 100, 100),
    ]
    r0 = bins.orderBy("start").first()
    assert r0.his_ptm_id == "BinHisPTM:chrA(1-150);H3K4me"
    assert r0.loci == "chrA(1-150)"


def test_yeast_histone_map_like_gene_overlap(spark):
    genome = spark.createDataFrame([("chrA", 400)], "chrom string, length bigint")
    genes = spark.createDataFrame(
        [("g_in", "chrA", 140, 160),    # spans windows 1 and 2
         ("g_edge", "chrA", 300, 310),  # touches window 2's end (closed)
         ("g_out", "chrA", 320, 390),   # in the gap before the tail
         ("g_off", "chrZ", 1, 400)],    # wrong chromosome
        "gene_id string, chrom string, gene_start long, gene_end long")
    nodes, edges = PP.yeast_histone_map_like(
        spark, genes, genome=genome, ptms=["H3K9ac"], resolution=150,
        bin_size=100)
    located = sorted(
        (r.subject, r.object) for r in edges.collect()
        if r.predicate == "biolink:located_in")
    assert located == [
        ("BinHisPTM:chrA(1-150);H3K9ac", "g_in"),
        ("BinHisPTM:chrA(151-300);H3K9ac", "g_edge"),
        ("BinHisPTM:chrA(151-300);H3K9ac", "g_in"),
    ]
    sub = {r.subject: r.object for r in edges.collect()
           if r.predicate == "biolink:subclass_of"}
    assert sub["BinHisPTM:chrA(1-150);H3K9ac"] == "HisPTM:H3K9ac"
    names = {r.id: r.name for r in nodes.collect()}
    assert names["BinHisPTM:chrA(1-150);H3K9ac"] == "H3K9ac (chrA:1-150)"


GASCH_CSV = """\
YORF,NAME,GWEIGHT,m5,m10,m20,m30,m40,m50,m60,m90
YAL001C,one,1,1.0,1.0,1.0,1.0,-1.0,-1.0,-1.0,0.5
YAL002W,two,1,-1.0,-1.0,0.25,0.25,0.25,0.25,-1.0,0.0
YORPHAN,three,1,1.0,1.0,1.0,1.0,1.0,1.0,1.0,1.0
"""


def test_gasch_like_golden(spark, tmp_path):
    genes = tmp_path / "genes.csv"
    genes.write_text(SGD_GENES_CSV)
    expr = tmp_path / "gasch.csv"
    expr.write_text(GASCH_CSV)
    edges = PP.gasch_like(spark, str(expr), str(genes))
    rows = {r.object: r for r in edges.collect()}
    # orphan YORF dropped by the inner join
    assert set(rows) == {"SGD:S000001", "SGD:S000002"}
    up = rows["SGD:S000001"]
    assert up.predicate == "biolink:increases_expression_of"
    assert abs(up.mean_expression - 0.1875) < 1e-12
    assert up.expression_time_series == [1.0, 1.0, 1.0, 1.0, -1.0, -1.0, -1.0, 0.5]
    down = rows["SGD:S000002"]
    # mean is -0.25: strictly-positive gate -> decreases
    assert down.predicate == "biolink:decreases_expression_of"
    assert down.subject == "PUBCHEM.COMPOUND:5353800"


def _gse_csv() -> str:
    hdr = ["nuc_id", "chr", "center", "coverage_rpm", "gene", "acc",
           "gene_pos"]
    for p in ("H3K4me", "HTZ1"):
        hdr += [f"{p}_{t}" for t in PP.YEAST_PTM_TIMEPOINTS]
    rows = [",".join(hdr)]
    # chr 1 -> chrI; center 100 falls in window (1,150)
    rows.append("N1,1,100,2.5,g,a,p," + ",".join(
        str(float(v)) for v in [1, 2, 3, 4, 5, 6, 9, 8, 7, 6, 5, 4]))
    # center 380 falls only in the tail window (397,400)? no — gap: drops
    rows.append("N2,1,380,1.0,g,a,p," + ",".join(["0.0"] * 12))
    # chr 2 -> chrII; center 399 in both window (301,450)-less genome?
    rows.append("N3,2,155,3.5,g,a,p," + ",".join(
        str(float(v)) for v in [9, 9, 9, 9, 9, 9, 1, 1, 1, 1, 1, 1]))
    return "\n".join(rows) + "\n"


def test_gse61888_like_golden(spark, tmp_path):
    p = tmp_path / "gse.csv"
    p.write_text(_gse_csv())
    genome = spark.createDataFrame(
        [("chrI", 400), ("chrII", 400)], "chrom string, length bigint")
    edges = PP.gse61888_like(
        spark, str(p), genome=genome, ptms=["H3K4me", "HTZ1"],
        resolution=150, bin_size=100)
    rows = edges.collect()
    by_key = {(r.nuc_id, r.histone_mod): r for r in rows}
    # N2's center (380, chrI) is in the gap before the tail -> dropped
    assert {k[0] for k in by_key} == {"N1", "N3"}
    # one edge per (nucleosome, ptm)
    assert len(rows) == 4
    r = by_key[("N1", "H3K4me")]
    assert r.object == "BinHisPTM:chrI(1-150);H3K4me"
    assert r.time_series == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    assert by_key[("N1", "HTZ1")].time_series == [9.0, 8.0, 7.0, 6.0, 5.0, 4.0]
    r3 = by_key[("N3", "HTZ1")]
    # roman conversion: chr 2 -> chrII; window (151,300)
    assert r3.object == "BinHisPTM:chrII(151-300);HTZ1"
    assert r3.time_series == [1.0, 1.0, 1.0, 1.0, 1.0, 1.0]
    assert r3.coverage == 3.5
    assert r3.predicate == "biolink:affects_molecular_modification_of"


def test_int_to_roman():
    assert [PP.int_to_roman(i) for i in (1, 4, 9, 14, 16, 17)] == [
        "I", "IV", "IX", "XIV", "XVI", "XVII"]


def test_interval_overlap_join_matches_bruteforce(spark):
    from orion_spark.operators.range_join import interval_overlap_join

    left_rows = [("L%d" % i, "b", 10 * i, 10 * i + 25) for i in range(20)]
    right_rows = [("R%d" % j, "b", 7 * j + 3, 7 * j + 12) for j in range(30)]
    left = spark.createDataFrame(
        left_rows, "lid string, chrom string, start long, end long")
    right = spark.createDataFrame(
        right_rows, "rid string, r_chrom string, r_start long, r_end long")
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(left, right, bin_size=16).collect()
    )
    expected = sorted(
        (l[0], r[0])
        for l in left_rows for r in right_rows
        if l[2] <= r[3] and r[2] <= l[3]
    )
    assert got == expected
