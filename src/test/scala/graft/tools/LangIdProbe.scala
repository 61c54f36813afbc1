package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway measurement harness for langIdWithMargin ACCURACY
  * (VERDICT r14 next-round #5). The p09 oracle key pins the
  * classifier's VALUES bit-for-bit, but its `correct` column compares
  * against the testdata's synthetic `lang` label, which is
  * content-UNCORRELATED (every sf* document is an English-vocab word
  * salad; the classifier says en/unknown for all five label groups, so
  * "accuracy" there measures label frequency, not linguistics). This
  * probe measures real accuracy on a hand-written corpus of natural
  * sentences:
  *   - 10 per original IN-SET language (en/de/fr/es/pt/it/nl latin
  *     families + ja/zh/ko/ru/ar scripts) and 5 per r16-added family
  *     (sv/pl/tr/ro — the r15 out-of-set leak, promoted to in-set with
  *     their own stopword families) — everyday topics, normal
  *     punctuation;
  *   - 5 per OUT-OF-SET language (da/cs — the nearest neighbors of the
  *     new sv/pl families) to keep measuring the documented boundary:
  *     out-of-set text resolves to whichever family shares function
  *     words, and the margin filter is what rejects it.
  * Reports overall + per-language accuracy, every misclassification,
  * and a margin-threshold sweep: precision and coverage of kept in-set
  * docs plus the out-of-set leak rate at each threshold — the numbers
  * DEPLOY.md's "filter on lang_margin" guidance cites.
  *
  * Usage: sbt "Test/runMain graft.tools.LangIdProbe"
  */
object LangIdProbe {
  // (true language, in classifier's 16-language set?, sentences)
  private val corpus: Seq[(String, Boolean, Seq[String])] = Seq(
    ("en", true, Seq(
      "The weather was cold and the streets were empty for most of the evening.",
      "She walked to the station with a book that her brother had given to her.",
      "This is an old house on the corner and it was built before the war.",
      "The results of the study are not clear and more work is needed.",
      "He said that the train was late because of the snow on the tracks.",
      "A small dog sat on the steps and watched the people in the park.",
      "The museum is open in the morning and closed for the rest of the day.",
      "They found it hard to agree on a plan for the summer holidays.",
      "The bread in this bakery is made with flour from the local mill.",
      "It was the first time that she had seen the sea in many years.")),
    ("de", true, Seq(
      "Der Zug war heute wieder zu spät und die Leute auf dem Bahnsteig waren ungeduldig.",
      "Die Kinder spielen im Garten und das Wetter ist schön für diese Jahreszeit.",
      "Es war eine lange Reise von Berlin zu der kleinen Stadt an der Küste.",
      "Ich glaube dass der Film sehr gut ist und wir sollten ihn mit den Nachbarn sehen.",
      "Das alte Haus ist seit Jahren leer und niemand will es kaufen oder mieten.",
      "Der Lehrer erklärte die Aufgabe und die Schüler begannen sofort mit der Arbeit.",
      "Sie hat ein neues Fahrrad für die Fahrt zu ihrer Arbeit in der Stadt gekauft.",
      "Am Morgen ist die Luft noch kühl aber der Nachmittag war warm und sonnig.",
      "Wir sind mit dem Auto in die Berge gefahren und der Blick war wunderbar.",
      "Eine Tasse Kaffee und ein Stück Kuchen sind für viele der beste Start in den Tag.")),
    ("fr", true, Seq(
      "Le train est arrivé en retard et les passagers étaient fatigués après le long voyage.",
      "Il a acheté du pain et du fromage pour le déjeuner avec ses amis.",
      "La maison est près de la rivière et le jardin est plein de fleurs.",
      "Ce matin le ciel était gris mais il ne pleut plus sur la ville.",
      "Elle pense que le film est très bon et que nous devons le voir ensemble.",
      "Les enfants jouent dans le parc et leurs parents parlent sur un banc.",
      "Nous avons pris un café à la terrasse avec une vue sur la mer.",
      "Le musée est ouvert le matin et fermé pour le reste de la journée.",
      "Il est difficile de trouver un appartement pas cher dans ce quartier de la capitale.",
      "La boulangerie du coin fait le meilleur pain de la ville depuis des années.")),
    ("es", true, Seq(
      "El tren llegó tarde y los pasajeros estaban cansados después del largo viaje.",
      "La casa está cerca del río y el jardín está lleno de flores en primavera.",
      "Los niños juegan en el parque y sus padres hablan en un banco.",
      "Creo que la película es muy buena y que debemos verla con los amigos.",
      "Compró pan y queso para el almuerzo en el mercado del pueblo.",
      "Este museo está abierto por la mañana y cerrado el resto del día.",
      "Es difícil encontrar un piso barato en este barrio de la capital.",
      "El café de la esquina es el mejor lugar para empezar el día.",
      "La playa estaba vacía y el agua del mar era fría para la época.",
      "Mañana vamos a la montaña con una mochila llena de comida y agua.")),
    ("pt", true, Seq(
      "O trem chegou atrasado e os passageiros estavam cansados depois da longa viagem.",
      "A casa fica perto do rio e o jardim está cheio de flores na primavera.",
      "As crianças brincam no parque e os pais conversam em um banco.",
      "Acho que o filme é muito bom e que devemos ver com os amigos.",
      "Ela comprou pão e queijo para o almoço no mercado da cidade.",
      "Este museu está aberto de manhã e fechado para o resto do dia.",
      "É difícil encontrar um apartamento barato neste bairro da capital.",
      "O café da esquina é o melhor lugar para começar o dia.",
      "A praia estava vazia e a água do mar era fria para a época.",
      "Amanhã vamos para a montanha com uma mochila cheia de comida e água.")),
    ("it", true, Seq(
      "Il treno è arrivato in ritardo e i passeggeri erano stanchi dopo il lungo viaggio.",
      "La casa è vicino al fiume e il giardino è pieno di fiori in primavera.",
      "I bambini giocano nel parco e i genitori parlano su una panchina.",
      "Credo che il film sia molto bello e che dobbiamo vederlo con gli amici.",
      "Ha comprato il pane e il formaggio per il pranzo al mercato della città.",
      "Questo museo è aperto la mattina e chiuso per il resto della giornata.",
      "È difficile trovare una casa economica in questo quartiere della capitale.",
      "Il caffè della piazza è il posto migliore per cominciare la giornata.",
      "La spiaggia era vuota e l'acqua del mare era fredda per la stagione.",
      "Domani andiamo in montagna con uno zaino pieno di cibo e di acqua.")),
    ("nl", true, Seq(
      "De trein was vandaag weer te laat en de mensen op het perron waren ongeduldig.",
      "De kinderen spelen in de tuin en het weer is mooi voor de tijd van het jaar.",
      "Het oude huis staat al jaren leeg en niemand wil het kopen of huren.",
      "Ik denk dat de film erg goed is en dat we hem samen moeten zien.",
      "Ze heeft een nieuwe fiets gekocht voor de rit naar haar werk in de stad.",
      "Het museum is open in de ochtend en gesloten voor de rest van de dag.",
      "We zijn met de auto naar de bergen gereden en het uitzicht was prachtig.",
      "De bakker op de hoek maakt al jaren het beste brood van de stad.",
      "In de ochtend is de lucht nog koel maar de middag was warm en zonnig.",
      "Een kop koffie en een stuk taart zijn voor veel mensen het beste begin van de dag.")),
    ("ja", true, Seq(
      "今日は天気がとても良いので、公園へ散歩に行きましょう。",
      "電車が遅れていたので、会議に間に合いませんでした。",
      "この本はとても面白くて、一晩で読んでしまいました。",
      "駅の近くに新しいパン屋がオープンしました。",
      "子供たちは庭で遊んでいて、母親は台所で料理をしています。",
      "来週の土曜日に友達と映画を見に行く予定です。",
      "コーヒーを飲みながら、ゆっくり新聞を読みました。",
      "夏休みには家族と海へ行きたいと思っています。",
      "日本語の勉強は難しいですが、とても楽しいです。",
      "雨が降っているので、傘を持って出かけてください。")),
    ("zh", true, Seq(
      "今天天气很好,我们去公园散步吧。",
      "火车晚点了,所以我没有赶上会议。",
      "这本书非常有趣,我一个晚上就看完了。",
      "车站附近新开了一家面包店。",
      "孩子们在院子里玩,妈妈在厨房做饭。",
      "下个星期六我打算和朋友去看电影。",
      "我一边喝咖啡一边慢慢看报纸。",
      "暑假我想和家人一起去海边。",
      "学习中文很难,但是很有意思。",
      "外面正在下雨,出门请带雨伞。")),
    ("ko", true, Seq(
      "오늘은 날씨가 좋아서 공원에 산책하러 갑니다.",
      "기차가 늦어서 회의에 늦었습니다.",
      "이 책은 정말 재미있어서 하룻밤에 다 읽었습니다.",
      "역 근처에 새로운 빵집이 문을 열었습니다.",
      "아이들은 마당에서 놀고 어머니는 부엌에서 요리를 합니다.",
      "다음 주 토요일에 친구와 영화를 보러 갈 예정입니다.",
      "커피를 마시면서 천천히 신문을 읽었습니다.",
      "여름 방학에는 가족과 바다에 가고 싶습니다.",
      "한국어 공부는 어렵지만 아주 재미있습니다.",
      "비가 오고 있으니 우산을 가지고 나가세요.")),
    ("ru", true, Seq(
      "Сегодня хорошая погода, и мы идём гулять в парк.",
      "Поезд опоздал, поэтому я не успел на встречу.",
      "Эта книга очень интересная, я прочитал её за одну ночь.",
      "Рядом с вокзалом открылась новая пекарня.",
      "Дети играют во дворе, а мама готовит на кухне.",
      "В следующую субботу мы с друзьями идём в кино.",
      "Я пил кофе и медленно читал газету.",
      "Летом я хочу поехать с семьёй на море.",
      "Учить русский язык трудно, но очень интересно.",
      "На улице идёт дождь, возьмите с собой зонт.")),
    ("ar", true, Seq(
      "الطقس جميل اليوم لذلك سنذهب إلى الحديقة للتنزه.",
      "تأخر القطار ولذلك لم ألحق بالاجتماع.",
      "هذا الكتاب ممتع جدا وقد قرأته في ليلة واحدة.",
      "افتتح مخبز جديد بالقرب من المحطة.",
      "يلعب الأطفال في الحديقة بينما تطبخ الأم في المطبخ.",
      "سأذهب مع أصدقائي إلى السينما يوم السبت القادم.",
      "شربت القهوة وقرأت الصحيفة ببطء.",
      "أريد أن أسافر مع عائلتي إلى البحر في الصيف.",
      "تعلم اللغة العربية صعب لكنه ممتع جدا.",
      "إنها تمطر في الخارج فخذ معك المظلة.")),
    ("sv", true, Seq(
      "Tåget var försenat igen och folk på perrongen var otåliga.",
      "Barnen leker i trädgården och vädret är fint för årstiden.",
      "Det gamla huset har stått tomt i flera år och ingen vill köpa det.",
      "Jag tror att filmen är mycket bra och att vi borde se den tillsammans.",
      "På morgonen är luften fortfarande sval men eftermiddagen var varm och solig.")),
    ("pl", true, Seq(
      "Pociąg znowu się spóźnił i ludzie na peronie byli zniecierpliwieni.",
      "Dzieci bawią się w ogrodzie a pogoda jest piękna jak na tę porę roku.",
      "Stary dom stoi pusty od lat i nikt nie chce go kupić.",
      "Myślę że ten film jest bardzo dobry i powinniśmy go obejrzeć razem.",
      "Rano powietrze jest jeszcze chłodne ale popołudnie było ciepłe i słoneczne.")),
    ("tr", true, Seq(
      "Tren yine gecikti ve perondaki insanlar sabırsızlanıyordu.",
      "Çocuklar bahçede oynuyor ve hava mevsime göre çok güzel.",
      "Eski ev yıllardır boş duruyor ve kimse onu almak istemiyor.",
      "Bence bu film çok iyi ve onu birlikte izlemeliyiz.",
      "Sabah hava hâlâ serin ama öğleden sonra sıcak ve güneşliydi.")),
    ("ro", true, Seq(
      "Trenul a întârziat din nou și oamenii de pe peron erau nerăbdători.",
      "Copiii se joacă în grădină și vremea este frumoasă pentru acest sezon.",
      "Casa veche stă goală de ani de zile și nimeni nu vrea să o cumpere.",
      "Cred că filmul este foarte bun și ar trebui să îl vedem împreună.",
      "Dimineața aerul este încă rece dar după amiaza a fost caldă și însorită.")),
    ("da", false, Seq(
      "Toget var forsinket igen og folk på perronen var utålmodige.",
      "Børnene leger i haven og vejret er fint for årstiden.",
      "Det gamle hus har stået tomt i mange år og ingen vil købe det.",
      "Jeg tror at filmen er meget god og at vi bør se den sammen.",
      "Om morgenen er luften stadig kølig men eftermiddagen var varm og solrig.")),
    ("cs", false, Seq(
      "Vlak měl opět zpoždění a lidé na nástupišti byli netrpěliví.",
      "Děti si hrají na zahradě a počasí je na tuto roční dobu krásné.",
      "Starý dům je už léta prázdný a nikdo ho nechce koupit.",
      "Myslím že ten film je velmi dobrý a měli bychom ho vidět spolu.",
      "Ráno je vzduch ještě chladný ale odpoledne bylo teplé a slunečné.")))

  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.session()
    import spark.implicits._
    val rows = corpus.flatMap { case (lang, inSet, texts) =>
      texts.map(t => (lang, inSet, t))
    }
    val scored = rows.toDF("lang_true", "in_set", "text")
      .withColumn("_lm",
        graft.pipeline.TextAnalysis.langIdWithMargin($"text"))
      .select($"lang_true", $"in_set", $"text",
        $"_lm.lang".as("lang_pred"), $"_lm.lang_margin".as("lang_margin"))
      .collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getString(2),
        r.getString(3), r.getDouble(4)))

    val inSet = scored.filter(_._2)
    val outSet = scored.filterNot(_._2)
    val acc = inSet.count(r => r._1 == r._4).toDouble / inSet.length
    println(f"[langid] in-set sentences=${inSet.length} " +
      f"out-of-set=${outSet.length} accuracy=$acc%.4f")
    corpus.foreach { case (lang, in, _) =>
      val ls = scored.filter(_._1 == lang)
      val hits = ls.count(r => r._1 == r._4)
      val meanMargin = ls.map(_._5).sum / ls.length
      println(f"[langid] lang=$lang in_set=$in acc=${hits.toDouble / ls.length}%.2f " +
        f"mean_margin=$meanMargin%.4f " +
        s"preds=${ls.groupBy(_._4).view.mapValues(_.length).toMap.toSeq.sortBy(-_._2).mkString(",")}")
    }
    scored.filter(r => r._2 && r._1 != r._4).foreach(r =>
      println(f"[langid] MISS true=${r._1} pred=${r._4} margin=${r._5}%.4f " +
        s"text=${r._3.take(60)}"))

    // margin-threshold sweep: keep only predictions with margin >= t.
    // precision = correct kept in-set / all kept (in OR out of set,
    // "unknown" predictions excluded from kept — the caller's filter
    // keeps labeled rows only); coverage = kept correct / all in-set;
    // leak = out-of-set rows that survive with a confident wrong label.
    println("[langid] threshold  precision  coverage  outset_leak")
    for (t <- Seq(0.0, 0.01, 0.02, 0.03, 0.05, 0.08, 0.10)) {
      val kept = scored.filter(r => r._4 != "unknown" && r._5 >= t)
      val keptIn = kept.filter(_._2)
      val correct = keptIn.count(r => r._1 == r._4)
      val leak = kept.count(!_._2)
      // an empty kept set is a finding, not a NaN row
      val precision = if (kept.isEmpty) "   (empty)"
        else f"${correct.toDouble / kept.length}%9.4f"
      println(f"[langid] $t%9.2f  $precision" +
        f"  ${correct.toDouble / inSet.length}%8.4f" +
        f"  ${leak.toDouble / outSet.length}%11.4f")
    }
    spark.stop()
  }
}
