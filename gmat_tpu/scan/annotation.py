"""Result annotation utilities.

Parity: reference `/root/reference/gmat/remma/annotation.py`:
- `annotation_snp_pos` (:22-74): join epistasis result rows to .bim SNP info,
  filter by p_cut and inter-SNP distance, optional LD pruning from a plink
  `.ld` file; writes `<res>.anno` (+ `.anno.ld`).
- `gtf_to_gene_info` (:5-19): extract gene rows from a GTF.
- `annotation_snp_nearest_gene` (:77-113): nearby-gene lookup per SNP.
"""
from __future__ import annotations

import re


def annotation_snp_pos(res_file: str, bed_prefix: str, p_cut: float = 1,
                       dis: float = 0, ld_file: str | None = None,
                       r2: float = 0.2) -> int:
    snp_info = {}
    with open(bed_prefix + ".bim") as fin:
        for order, line in enumerate(fin):
            snp_info[str(order)] = " ".join(line.split())
    with open(res_file) as fin, open(res_file + ".anno", "w") as fout:
        header = fin.readline().split()
        fout.write(
            " ".join(
                [header[0], "snp0_chr", "snp0_ID", "snp0_cm", "snp0_bp",
                 "snp0_allele1", "snp0_allele2", header[1], "snp1_chr",
                 "snp1_ID", "snp1_cm", "snp1_bp", "snp1_allele1",
                 "snp1_allele2"] + header[2:]
            )
            + "\n"
        )
        for line in fin:
            arr = line.split()
            snp0 = snp_info[arr[0]].split()
            snp1 = snp_info[arr[1]].split()
            if float(arr[-1]) <= p_cut and (
                snp0[0] != snp1[0] or abs(float(snp0[3]) - float(snp1[3])) > dis
            ):
                fout.write(
                    " ".join([arr[0], snp_info[arr[0]], arr[1],
                              snp_info[arr[1]]] + arr[2:])
                    + "\n"
                )
    if ld_file is not None:
        ld_id = set()
        with open(ld_file) as fin:
            fin.readline()
            for line in fin:
                arr = line.split()
                if float(arr[-1]) > r2:
                    ld_id.add((arr[2], arr[5]))
                    ld_id.add((arr[5], arr[2]))
        with open(res_file + ".anno") as fin, open(res_file + ".anno.ld", "w") as fout:
            fout.write(fin.readline())
            for line in fin:
                arr = line.split()
                if (arr[2], arr[9]) not in ld_id:
                    fout.write(line)
    return 0


def gtf_to_gene_info(gtf_file: str) -> str:
    out = gtf_file + ".gene_info"
    with open(gtf_file) as fin, open(out, "w") as fout:
        for line in fin:
            if "#" in line:
                continue
            arr = line.split()
            if len(arr) > 2 and arr[2] == "gene":
                m = re.search(r'gene_id\s+"(.+?)".+gene_name\s+"(.+?)"', line,
                              re.I)
                if m:
                    fout.write(
                        " ".join([arr[0], arr[3], arr[4], arr[6],
                                  m.group(1), m.group(2)]) + "\n"
                    )
    return out


def annotation_snp_nearest_gene(bed_prefix: str, gene_file: str,
                                max_distance: int = 150000) -> str:
    gene_info: dict[str, list[list[str]]] = {}
    with open(gene_file) as fin:
        for line in fin:
            arr = line.split()
            gene_info.setdefault(arr[0], []).append(arr)
    out = bed_prefix + ".nearby_genes"
    with open(bed_prefix + ".bim") as fin, open(out, "w") as fout:
        for line in fin:
            snp_line = line.strip()
            arr = line.split()
            snp_pos = int(arr[3])
            for gene in gene_info.get(arr[0], []):
                start, end = int(gene[1]), int(gene[2])
                if snp_pos > start and snp_pos < end:
                    fout.write(f"{snp_line} {' '.join(gene)} within\n")
                else:
                    distance = min(abs(snp_pos - start), abs(snp_pos - end))
                    if distance < max_distance:
                        fout.write(f"{snp_line} {' '.join(gene)} {distance}\n")
    return out
