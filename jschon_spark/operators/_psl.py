"""Vendored TRIMMED snapshot of the Public Suffix List (round 6).

The PSL (publicsuffix.org, Mozilla-maintained, MPL-2.0 — public
knowledge) is what separates a *registrable domain* from a public
suffix: under a naive last-two-labels heuristic ``foo.co.uk`` would
yield the meaningless "domain" ``co.uk`` and every UK/JP/AU site would
collapse into one bucket for per-domain caps. The full list is ~10k
entries and network-fetched; a 100 TB curation pass needs neither —
the multi-label entries for the major ccTLD registries plus the
highest-traffic private-section hosts cover the overwhelming mass of
crawled URLs, and anything absent falls back to the (correct for flat
TLDs) last-two-labels rule.

Both suffix sets are plain frozensets so the Spark side lowers them to
a codegen'd ``InSet`` literal (zero shuffle, no broadcast join needed)
and the DuckDB oracle replays the SAME sets as SQL ``IN`` lists —
single-sourced from this module.
"""

from __future__ import annotations

# 2-label public suffixes: a host ``a.b.SUF2`` has registrable domain
# ``b.SUF2``. ICANN-section entries for the major multi-level ccTLD
# registries + widely used private-section platforms.
PSL_2LABEL: frozenset[str] = frozenset(
    # United Kingdom
    "co.uk org.uk me.uk ltd.uk plc.uk net.uk sch.uk ac.uk gov.uk "
    "nhs.uk police.uk mod.uk "
    # Australia
    "com.au net.au org.au edu.au gov.au asn.au id.au "
    # Japan
    "co.jp or.jp ne.jp ac.jp ad.jp ed.jp go.jp gr.jp lg.jp "
    # New Zealand
    "co.nz net.nz org.nz govt.nz ac.nz geek.nz gen.nz kiwi.nz "
    "maori.nz school.nz health.nz iwi.nz mil.nz parliament.nz "
    # South Africa
    "co.za org.za net.za gov.za ac.za web.za edu.za law.za mil.za nom.za "
    # Brazil
    "com.br net.br org.br gov.br edu.br art.br blog.br eco.br "
    "emp.br esp.br far.br flog.br ind.br inf.br jus.br leg.br "
    "mil.br tv.br wiki.br "
    # China
    "com.cn net.cn org.cn gov.cn edu.cn ac.cn mil.cn "
    "ah.cn bj.cn cq.cn fj.cn gd.cn gs.cn gx.cn gz.cn ha.cn hb.cn "
    "he.cn hi.cn hk.cn hl.cn hn.cn jl.cn js.cn jx.cn ln.cn mo.cn "
    "nm.cn nx.cn qh.cn sc.cn sd.cn sh.cn sn.cn sx.cn tj.cn tw.cn "
    "xj.cn xz.cn yn.cn zj.cn "
    # Mexico
    "com.mx org.mx net.mx gob.mx edu.mx "
    # India
    "co.in net.in org.in firm.in gen.in ind.in ac.in edu.in res.in "
    "gov.in mil.in nic.in "
    # South Korea
    "co.kr ne.kr or.kr re.kr pe.kr go.kr mil.kr ac.kr hs.kr ms.kr "
    "es.kr sc.kr kg.kr seoul.kr busan.kr "
    # Taiwan / Hong Kong / Singapore / Malaysia
    "com.tw net.tw org.tw edu.tw gov.tw idv.tw mil.tw "
    "com.hk net.hk org.hk gov.hk edu.hk idv.hk "
    "com.sg net.sg org.sg gov.sg edu.sg per.sg "
    "com.my net.my org.my gov.my edu.my mil.my name.my "
    # Argentina / Turkey / Israel / Ukraine
    "com.ar net.ar org.ar gob.ar edu.ar int.ar mil.ar tur.ar "
    "com.tr net.tr org.tr gov.tr edu.tr biz.tr info.tr av.tr "
    "bbs.tr gen.tr web.tr tv.tr bel.tr pol.tr mil.tr k12.tr "
    "co.il org.il net.il ac.il gov.il muni.il idf.il k12.il "
    "com.ua net.ua org.ua edu.ua gov.ua in.ua kiev.ua lviv.ua "
    # Indonesia / Philippines / Vietnam / Thailand
    "co.id or.id net.id web.id ac.id sch.id go.id mil.id biz.id my.id "
    "com.ph net.ph org.ph gov.ph edu.ph ngo.ph mil.ph i.ph "
    "com.vn net.vn org.vn edu.vn gov.vn int.vn ac.vn biz.vn "
    "info.vn name.vn pro.vn health.vn "
    "co.th ac.th go.th in.th mi.th net.th or.th "
    # Egypt / Saudi Arabia / Pakistan / Nigeria / Kenya
    "com.eg net.eg org.eg gov.eg edu.eg sci.eg eun.eg mil.eg "
    "com.sa net.sa org.sa gov.sa edu.sa med.sa pub.sa sch.sa "
    "com.pk net.pk org.pk gov.pk edu.pk fam.pk biz.pk web.pk gok.pk "
    "com.ng net.ng org.ng gov.ng edu.ng name.ng sch.ng mil.ng mobi.ng "
    "co.ke or.ke ne.ke go.ke ac.ke sc.ke me.ke mobi.ke info.ke "
    # Europe ccTLDs with second levels
    "co.at or.at ac.at gv.at "
    "com.pl net.pl org.pl edu.pl gov.pl info.pl waw.pl "
    "com.pt net.pt org.pt edu.pt gov.pt int.pt publ.pt "
    "com.gr net.gr org.gr edu.gr gov.gr "
    "com.ro org.ro tm.ro nt.ro nom.ro info.ro rec.ro arts.ro "
    "firm.ro store.ro www.ro "
    "com.ru net.ru org.ru pp.ru msk.ru spb.ru "
    "co.hu org.hu info.hu priv.hu sport.hu tm.hu 2000.hu "
    # Americas / misc
    "com.co net.co org.co edu.co gov.co mil.co nom.co "
    "com.pe net.pe org.pe edu.pe gob.pe mil.pe nom.pe "
    "com.ve net.ve org.ve edu.ve gob.ve mil.ve web.ve info.ve co.ve "
    "com.ec net.ec org.ec edu.ec gob.ec mil.ec fin.ec med.ec pro.ec "
    "com.uy net.uy org.uy edu.uy gub.uy mil.uy "
    "com.bo net.bo org.bo edu.bo gob.bo mil.bo tv.bo web.bo "
    "co.cr ac.cr ed.cr fi.cr go.cr or.cr sa.cr "
    "com.do net.do org.do edu.do gob.do gov.do mil.do sld.do web.do "
    "com.gt net.gt org.gt edu.gt gob.gt ind.gt mil.gt "
    "com.sv edu.sv gob.sv org.sv red.sv "
    "com.pa net.pa org.pa edu.pa gob.pa ac.pa sld.pa "
    "com.py net.py org.py edu.py gov.py mil.py coop.py "
    "com.ni net.ni org.ni edu.ni gob.ni mil.ni co.ni biz.ni in.ni "
    # private-section platforms a web crawl actually hits
    "github.io gitlab.io bitbucket.io blogspot.com wordpress.com "
    "herokuapp.com netlify.app vercel.app web.app firebaseapp.com "
    "appspot.com azurewebsites.net cloudfront.net glitch.me "
    "pages.dev workers.dev fly.dev onrender.com readthedocs.io "
    "neocities.org surge.sh tumblr.com weebly.com wixsite.com "
    "repl.co deno.dev hashnode.dev substack.com ghost.io "
    "myshopify.com bandcamp.com carrd.co webflow.io".split()
)

# 3-label public suffixes: a host ``a.b.SUF3`` has registrable domain
# ``b.SUF3``. The handful with real crawl mass.
PSL_3LABEL: frozenset[str] = frozenset(
    "s3.amazonaws.com elb.amazonaws.com "
    "blogspot.co.uk blogspot.com.au blogspot.co.nz blogspot.com.br "
    "blogspot.co.za blogspot.com.ar blogspot.co.il blogspot.com.tr "
    "blogspot.co.id blogspot.com.es blogspot.co.ke blogspot.com.mx".split()
)


def sql_in_list(entries: frozenset[str]) -> str:
    """Render a suffix set as a deterministic SQL IN list — the DuckDB
    oracle replays the exact sets the Spark InSet uses."""
    return ", ".join(f"'{e}'" for e in sorted(entries))
