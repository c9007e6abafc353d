package graft.text

/** Trimmed snapshot of the Mozilla Public Suffix List's multi-label rules
  * (publicsuffix.org — public data; the full ICANN section is ~7k rules and
  * needs periodic refresh, which a library constant cannot promise).
  *
  * Scope of the trim, chosen by what web-corpus URL-keyed ops actually hit:
  * the complete second-level families of the high-volume ccTLDs (uk, jp,
  * au, nz, kr, in, za, br, cn, tw, ru, pl, tr, il, ua, and the Latin
  * American / SE-Asian / Gulf com.xx families), the PSL's wildcard TLD
  * rules (`*.bd`, `*.ck`, …) with their exceptions (`!www.ck`), the
  * Japanese city wildcards (`*.kawasaki.jp` … with `!city.*` exceptions),
  * and the US `k12/cc/lib.<state>.us` third levels. Rule syntax is the
  * PSL's own: plain labels = exact rule, `*.` prefix = any label matches
  * that position, `!` prefix = exception (the match is NOT a public
  * suffix; its suffix is the rule minus the leftmost label). Single-label
  * TLDs are NOT listed — the PSL default rule `*` (suffix = last label)
  * covers them in [[UrlLib.registeredDomain]].
  *
  * Callers needing exact parity with today's full list pass their own rule
  * seq (same syntax) to [[UrlLib.registeredDomain]].
  */
object PublicSuffixes {

  private val usStates = Seq(
    "al", "ak", "az", "ar", "ca", "co", "ct", "de", "dc", "fl", "ga", "hi",
    "ia", "id", "il", "in", "ks", "ky", "la", "ma", "md", "me", "mi", "mn",
    "mo", "ms", "mt", "nc", "nd", "ne", "nh", "nj", "nm", "nv", "ny", "oh",
    "ok", "or", "pa", "ri", "sc", "sd", "tn", "tx", "ut", "va", "vt", "wa",
    "wi", "wv", "wy")

  /** Japanese designated-city wildcards: any town label under these city
    * domains is a public suffix, EXCEPT the city government's own
    * `city.<name>.jp`.
    */
  private val jpCityWildcards: Seq[String] = Seq(
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp"
  ).flatMap(c => Seq(s"*.$c", s"!city.$c"))

  /** Japanese prefecture second levels (all 47). */
  private val jpPrefectures: Seq[String] = Seq(
    "aichi", "akita", "aomori", "chiba", "ehime", "fukui", "fukuoka",
    "fukushima", "gifu", "gunma", "hiroshima", "hokkaido", "hyogo",
    "ibaraki", "ishikawa", "iwate", "kagawa", "kagoshima", "kanagawa",
    "kochi", "kumamoto", "kyoto", "mie", "miyagi", "miyazaki", "nagano",
    "nagasaki", "nara", "niigata", "oita", "okayama", "okinawa", "osaka",
    "saga", "saitama", "shiga", "shimane", "shizuoka", "tochigi",
    "tokushima", "tokyo", "tottori", "toyama", "wakayama", "yamagata",
    "yamaguchi", "yamanashi").map(_ + ".jp")

  /** Wildcard TLDs where every second level is a public suffix, with the
    * PSL's exceptions.
    */
  private val wildcardTlds: Seq[String] = Seq(
    "*.bd", "*.ck", "!www.ck", "*.er", "*.fk", "*.jm", "*.kh", "*.mm",
    "*.np", "*.pg", "*.ye")

  val Snapshot: Seq[String] = (Seq(
    // ---- uk
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "police.uk", "*.sch.uk",
    // ---- au (incl. states and edu/gov second levels)
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "info.au", "conf.au", "oz.au", "act.au", "nsw.au", "nt.au", "qld.au",
    "sa.au", "tas.au", "vic.au", "wa.au",
    "act.edu.au", "nsw.edu.au", "nt.edu.au", "qld.edu.au", "sa.edu.au",
    "tas.edu.au", "vic.edu.au", "wa.edu.au",
    // ---- jp core
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    // ---- nz
    "ac.nz", "co.nz", "cri.nz", "geek.nz", "gen.nz", "govt.nz",
    "health.nz", "iwi.nz", "kiwi.nz", "maori.nz", "mil.nz", "net.nz",
    "org.nz", "parliament.nz", "school.nz",
    // ---- kr
    "ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr", "mil.kr",
    "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr", "seoul.kr",
    "busan.kr", "daegu.kr", "incheon.kr", "gwangju.kr", "daejeon.kr",
    "ulsan.kr", "gyeonggi.kr", "gangwon.kr", "chungbuk.kr", "chungnam.kr",
    "jeonbuk.kr", "jeonnam.kr", "gyeongbuk.kr", "gyeongnam.kr", "jeju.kr",
    // ---- in
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "mil.in", "net.in", "nic.in", "org.in", "res.in",
    // ---- za
    "ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za", "net.za",
    "nom.za", "org.za", "school.za", "web.za",
    // ---- br (common subset of the long registro.br family)
    "adv.br", "agr.br", "am.br", "arq.br", "art.br", "ato.br", "b.br",
    "bio.br", "blog.br", "cim.br", "com.br", "coop.br", "eco.br",
    "edu.br", "emp.br", "eng.br", "esp.br", "far.br", "flog.br", "fm.br",
    "g12.br", "gov.br", "imb.br", "ind.br", "inf.br", "jor.br", "jus.br",
    "leg.br", "med.br", "mil.br", "mp.br", "net.br", "not.br", "ntr.br",
    "odo.br", "org.br", "ppg.br", "pro.br", "psc.br", "psi.br", "rec.br",
    "srv.br", "tmp.br", "tur.br", "tv.br", "vet.br", "wiki.br", "zlg.br",
    // ---- cn (+ provinces)
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn", "org.cn",
    "ah.cn", "bj.cn", "cq.cn", "fj.cn", "gd.cn", "gs.cn", "gx.cn",
    "gz.cn", "ha.cn", "hb.cn", "he.cn", "hi.cn", "hk.cn", "hl.cn",
    "hn.cn", "jl.cn", "js.cn", "jx.cn", "ln.cn", "mo.cn", "nm.cn",
    "nx.cn", "qh.cn", "sc.cn", "sd.cn", "sh.cn", "sn.cn", "sx.cn",
    "tj.cn", "tw.cn", "xj.cn", "xz.cn", "yn.cn", "zj.cn",
    // ---- tw
    "club.tw", "com.tw", "ebiz.tw", "edu.tw", "game.tw", "gov.tw",
    "idv.tw", "mil.tw", "net.tw", "org.tw",
    // ---- ru / ua / pl
    "com.ru", "net.ru", "org.ru", "pp.ru", "msk.ru", "spb.ru",
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua", "kiev.ua",
    "kyiv.ua", "kharkiv.ua", "lviv.ua", "odessa.ua", "dp.ua", "kh.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
    "biz.pl", "waw.pl", "wroc.pl", "krakow.pl", "poznan.pl", "gda.pl",
    "lodz.pl", "slask.pl",
    // ---- tr / il / gulf
    "av.tr", "bbs.tr", "bel.tr", "biz.tr", "com.tr", "dr.tr", "edu.tr",
    "gen.tr", "gov.tr", "info.tr", "k12.tr", "mil.tr", "net.tr",
    "org.tr", "pol.tr", "tel.tr", "web.tr",
    "ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il", "net.il",
    "org.il",
    "ac.ae", "co.ae", "gov.ae", "mil.ae", "net.ae", "org.ae", "sch.ae",
    "com.sa", "edu.sa", "gov.sa", "med.sa", "net.sa", "org.sa", "pub.sa",
    "sch.sa", "com.kw", "edu.kw", "gov.kw", "net.kw", "org.kw",
    "com.qa", "edu.qa", "gov.qa", "mil.qa", "net.qa", "org.qa", "sch.qa",
    "com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg",
    "net.eg", "org.eg", "sci.eg",
    "com.jo", "edu.jo", "gov.jo", "mil.jo", "name.jo", "net.jo",
    "org.jo", "sch.jo", "com.lb", "edu.lb", "gov.lb", "net.lb", "org.lb",
    // ---- latam
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    "com.ar", "edu.ar", "gob.ar", "gov.ar", "int.ar", "mil.ar",
    "musica.ar", "net.ar", "org.ar", "tur.ar",
    "com.co", "edu.co", "gov.co", "mil.co", "net.co", "nom.co", "org.co",
    "com.ve", "co.ve", "edu.ve", "gob.ve", "info.ve", "mil.ve", "net.ve",
    "org.ve", "web.ve",
    "com.pe", "edu.pe", "gob.pe", "mil.pe", "net.pe", "nom.pe", "org.pe",
    "com.uy", "edu.uy", "gub.uy", "mil.uy", "net.uy", "org.uy",
    "com.py", "edu.py", "gov.py", "mil.py", "net.py", "org.py",
    "com.bo", "edu.bo", "gob.bo", "int.bo", "mil.bo", "net.bo", "org.bo",
    "tv.bo", "web.bo",
    "com.ec", "edu.ec", "fin.ec", "gob.ec", "gov.ec", "info.ec",
    "med.ec", "mil.ec", "net.ec", "org.ec", "pro.ec",
    "com.do", "edu.do", "gob.do", "gov.do", "mil.do", "net.do", "org.do",
    "sld.do", "web.do",
    "com.gt", "edu.gt", "gob.gt", "ind.gt", "mil.gt", "net.gt", "org.gt",
    "com.sv", "edu.sv", "gob.sv", "org.sv", "red.sv",
    "com.hn", "edu.hn", "gob.hn", "mil.hn", "net.hn", "org.hn",
    "com.ni", "edu.ni", "gob.ni", "mil.ni", "net.ni", "org.ni",
    "com.pa", "edu.pa", "gob.pa", "ing.pa", "med.pa", "net.pa", "nom.pa",
    "org.pa", "sld.pa",
    "com.pr", "edu.pr", "gov.pr", "net.pr", "org.pr", "pro.pr", "biz.pr",
    "info.pr", "isla.pr", "name.pr", "est.pr", "prof.pr", "ac.pr",
    "com.cu", "edu.cu", "gov.cu", "inf.cu", "net.cu", "org.cu",
    "com.cl", "gob.cl", "gov.cl", "mil.cl",
    // ---- asia-pacific
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "com.my", "edu.my", "gov.my", "mil.my", "name.my", "net.my",
    "org.my",
    "ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id", "my.id",
    "net.id", "or.id", "ponpes.id", "sch.id", "web.id",
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "com.ph", "edu.ph", "gov.ph", "i.ph", "mil.ph", "net.ph", "ngo.ph",
    "org.ph",
    "ac.vn", "biz.vn", "com.vn", "edu.vn", "gov.vn", "health.vn",
    "info.vn", "int.vn", "name.vn", "net.vn", "org.vn", "pro.vn",
    "co.bw", "org.bw", "co.ke", "go.ke", "info.ke", "me.ke", "mobi.ke",
    "ne.ke", "or.ke", "sc.ke", "ac.ke",
    "com.ng", "edu.ng", "gov.ng", "i.ng", "mil.ng", "mobi.ng", "name.ng",
    "net.ng", "org.ng", "sch.ng",
    "co.tz", "ac.tz", "go.tz", "hotel.tz", "info.tz", "me.tz", "mil.tz",
    "mobi.tz", "ne.tz", "or.tz", "sc.tz", "tv.tz",
    "co.ug", "ac.ug", "go.ug", "ne.ug", "or.ug", "org.ug", "sc.ug",
    "co.zm", "ac.zm", "biz.zm", "com.zm", "edu.zm", "gov.zm", "info.zm",
    "mil.zm", "net.zm", "org.zm", "sch.zm",
    "co.zw", "ac.zw", "gov.zw", "mil.zw", "org.zw",
    // ---- europe misc (multi-label families only)
    "co.at", "or.at", "ac.at", "gv.at", "priv.at",
    "com.de", "com.se", "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt",
    "org.pt", "publ.pt",
    "com.gr", "edu.gr", "gov.gr", "net.gr", "org.gr",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro", "rec.ro",
    "arts.ro", "firm.ro", "store.ro", "www.ro",
    "co.hu", "org.hu", "priv.hu", "info.hu", "tm.hu", "2000.hu",
    "agrar.hu", "bolt.hu", "city.hu", "film.hu",
    "com.mt", "edu.mt", "net.mt", "org.mt",
    "com.cy", "biz.cy", "ltd.cy", "name.cy", "net.cy", "org.cy",
    "press.cy", "pro.cy", "tm.cy",
    // ---- north america
    "co.ca", "gc.ca", "ab.ca", "bc.ca", "mb.ca", "nb.ca", "nf.ca",
    "nl.ca", "ns.ca", "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca",
    "sk.ca", "yk.ca")
    ++ jpPrefectures
    ++ jpCityWildcards
    ++ wildcardTlds
    ++ usStates.flatMap(s => Seq(s"k12.$s.us", s"cc.$s.us", s"lib.$s.us"))
    ).distinct
}
