"""Dev smoke: reference goldens from tests/unit/ops/test_categorify.py."""
import sys

sys.path.insert(0, "/root/repo")

import pandas as pd
from pyspark.sql import SparkSession

import nvtabular_spark as nvt
from nvtabular_spark import ops

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .appName("smoke").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# --- test_categorify_multi joint golden (test_categorify.py:163-195) ---
df = spark.createDataFrame(pd.DataFrame({
    "Author": ["User_A", "User_E", "User_B", "User_C"],
    "Engaging User": ["User_B", "User_B", "User_A", "User_D"],
    "Post": [1, 2, 3, 4],
}))
cats = [["Author", "Engaging User"]] >> ops.Categorify(encode_type="joint")
wf = nvt.Workflow(cats + ["Post"])
out = wf.fit_transform(df).orderBy("Post").toPandas()
print(out)
assert out["Author"].tolist() == [4, 7, 3, 5], out["Author"].tolist()
assert out["Engaging User"].tolist() == [3, 3, 4, 6], out["Engaging User"].tolist()
print("joint golden OK")

# --- combo ---
cats2 = [["Author", "Engaging User"]] >> ops.Categorify(encode_type="combo")
wf2 = nvt.Workflow(cats2 + ["Post"])
out2 = wf2.fit_transform(df).orderBy("Post").toPandas()
print(out2)
# 4 unique combos, all count 1 → codes 3..6 ordered by value asc:
# (A,B)->3, (B,A)->4, (C,D)->5, (E,B)->6
assert out2["Author_Engaging User"].tolist() == [3, 6, 4, 5], out2.to_dict()
print("combo golden OK")

# --- list-column golden (test_categorify.py:128-157) ---
dfl = spark.createDataFrame(pd.DataFrame({
    "Authors": [["User_A"], ["User_A", "User_E"], ["User_B", "User_C"],
                ["User_C"]],
    "Post": [1, 2, 3, 4],
}))
catsl = ["Authors"] >> ops.Categorify()
wfl = nvt.Workflow(catsl + ["Post"])
outl = wfl.fit_transform(dfl).orderBy("Post").toPandas()
print(outl)
assert [list(x) for x in outl["Authors"]] == [[3], [3, 6], [5, 4], [4]], outl
print("list golden OK")

# --- freq_threshold=2 golden: rare → OOV(2) ---
catsf = ["Authors"] >> ops.Categorify(freq_threshold=2)
wff = nvt.Workflow(catsf + ["Post"])
outf = wff.fit_transform(dfl).orderBy("Post").toPandas()
assert [list(x) for x in outf["Authors"]] == [[3], [3, 2], [2, 4], [4]], outf
print("freq_threshold golden OK")

# --- pipeline: FillMissing → Clip → LogOp + Normalize + TE ---
pdf = pd.DataFrame({
    "x": [1.0, None, 3.0, 4.0, 5.0, None],
    "cat": ["a", "b", "a", "a", "b", "b"],
    "y": [1.0, 0.0, 1.0, 0.0, 1.0, 0.0],
    "id": [1, 2, 3, 4, 5, 6],
})
sdf = spark.createDataFrame(pdf)
conts = ["x"] >> ops.FillMissing(fill_val=0) >> ops.Clip(min_value=0) >> ops.LogOp()
norm = ["x"] >> ops.FillMissing(fill_val=0) >> ops.Rename(postfix="_n") >> ops.Normalize()
te = ["cat"] >> ops.TargetEncoding(target="y", fold_col="id", kfold=2,
                                   p_smooth=1.0)
wf3 = nvt.Workflow(conts + norm + te + ["id"])
out3 = wf3.fit_transform(sdf).orderBy("id").toPandas()
print(out3)
assert "TE_cat_y" in out3.columns and "x_n" in out3.columns
print("pipeline OK")

# --- save/load round trip ---
import tempfile
p = tempfile.mkdtemp() + "/wf"
wf3.save(p)
wf4 = nvt.Workflow.load(p, spark)
out4 = wf4.transform(sdf).orderBy("id").toPandas()
pd.testing.assert_frame_equal(out3, out4)
print("save/load round-trip OK")

print("ALL SMOKE OK")
