"""Extended oEmbed provider registry — the long tail of the PUBLIC
https://oembed.com/providers.json dump, bundled offline (no network in
this environment; entries reconstructed from the public registry).

These are appended AFTER ``oembed_providers.PROVIDERS`` so the
snapshot-parity-verified corpus providers keep first-match priority;
``load_registry()`` still swaps in a verbatim providers.json dump at
deploy time.  Shape is providers.json's: ``{"provider_name",
"endpoints": [{"schemes": [...], "url": endpoint}]}`` — endpoint bases
without a ``url=`` query are normalized by ``_build``.
"""

from __future__ import annotations

EXTRA_PROVIDERS: list[dict] = [
    {"provider_name": "23HQ", "endpoints": [{
        "schemes": ["http://www.23hq.com/*/photo/*"],
        "url": "https://www.23hq.com/23/oembed"}]},
    {"provider_name": "Acast", "endpoints": [{
        "schemes": ["https://play.acast.com/s/*",
                    "https://embed.acast.com/*"],
        "url": "https://oembed.acast.com/v1/embed-player"}]},
    {"provider_name": "Amcharts Live Editor", "endpoints": [{
        "schemes": ["https://live.amcharts.com/*"],
        "url": "https://live.amcharts.com/oembed"}]},
    {"provider_name": "Animoto", "endpoints": [{
        "schemes": ["http://animoto.com/play/*",
                    "https://animoto.com/play/*"],
        "url": "https://animoto.com/oembeds/create"}]},
    {"provider_name": "Apple Music", "endpoints": [{
        "schemes": ["https://music.apple.com/*"],
        "url": "https://embed.music.apple.com/api/v1/oembed"}]},
    {"provider_name": "Apple Podcasts", "endpoints": [{
        "schemes": ["https://podcasts.apple.com/*"],
        "url": "https://embed.podcasts.apple.com/api/v1/oembed"}]},
    {"provider_name": "Audioboom", "endpoints": [{
        "schemes": ["https://audioboom.com/posts/*",
                    "https://audioboom.com/channels/*"],
        "url": "https://audioboom.com/publishing/oembed.json"}]},
    {"provider_name": "Audiomack", "endpoints": [{
        "schemes": ["https://audiomack.com/*/song/*",
                    "https://audiomack.com/*/album/*",
                    "https://audiomack.com/*/playlist/*"],
        "url": "https://audiomack.com/oembed"}]},
    {"provider_name": "Behance", "endpoints": [{
        "schemes": ["https://www.behance.net/gallery/*/*"],
        "url": "https://www.behance.net/services/oembed"}]},
    {"provider_name": "Buzzsprout", "endpoints": [{
        "schemes": ["https://www.buzzsprout.com/*/*"],
        "url": "https://www.buzzsprout.com/oembed"}]},
    {"provider_name": "Cacoo", "endpoints": [{
        "schemes": ["https://cacoo.com/diagrams/*"],
        "url": "https://cacoo.com/oembed.json"}]},
    {"provider_name": "ChartBlocks", "endpoints": [{
        "schemes": ["http://public.chartblocks.com/c/*",
                    "https://public.chartblocks.com/c/*"],
        "url": "https://embed.chartblocks.com/1.0/oembed"}]},
    {"provider_name": "CircuitLab", "endpoints": [{
        "schemes": ["https://www.circuitlab.com/circuit/*"],
        "url": "https://www.circuitlab.com/circuit/oembed/"}]},
    {"provider_name": "Clyp", "endpoints": [{
        "schemes": ["http://clyp.it/*", "https://clyp.it/*",
                    "http://clyp.it/playlist/*"],
        "url": "https://api.clyp.it/oembed/"}]},
    {"provider_name": "Coub", "endpoints": [{
        "schemes": ["http://coub.com/view/*", "https://coub.com/view/*",
                    "http://coub.com/embed/*"],
        "url": "https://coub.com/api/oembed.json"}]},
    {"provider_name": "Crowdsignal", "endpoints": [{
        "schemes": ["https://*.polldaddy.com/s/*",
                    "https://*.polldaddy.com/poll/*",
                    "https://*.survey.fm/*"],
        "url": "https://api.crowdsignal.com/oembed"}]},
    {"provider_name": "Dotsub", "endpoints": [{
        "schemes": ["https://dotsub.com/view/*",
                    "http://dotsub.com/view/*"],
        "url": "https://dotsub.com/services/oembed"}]},
    {"provider_name": "Eventbrite", "endpoints": [{
        "schemes": ["https://www.eventbrite.com/e/*",
                    "https://www.eventbrite.co.uk/e/*"],
        "url": "https://www.eventbrite.com/api/v3/destination/oembed"}]},
    {"provider_name": "Fader", "endpoints": [{
        "schemes": ["https://app.getfader.com/projects/*/publish"],
        "url": "https://app.getfader.com/api/oembed"}]},
    {"provider_name": "FITE", "endpoints": [{
        "schemes": ["https://www.fite.tv/watch/*"],
        "url": "https://www.fite.tv/oembed"}]},
    {"provider_name": "Flourish", "endpoints": [{
        "schemes": ["https://public.flourish.studio/visualisation/*",
                    "https://public.flourish.studio/story/*"],
        "url": "https://app.flourish.studio/api/v1/oembed"}]},
    {"provider_name": "Framer", "endpoints": [{
        "schemes": ["https://framer.com/share/*",
                    "https://framer.com/embed/*"],
        "url": "https://api.framer.com/web/oembed"}]},
    {"provider_name": "Geograph Britain and Ireland", "endpoints": [{
        "schemes": ["http://*.geograph.org.uk/*",
                    "https://*.geograph.org.uk/*"],
        "url": "https://api.geograph.org.uk/api/oembed"}]},
    {"provider_name": "Gfycat", "endpoints": [{
        "schemes": ["http://gfycat.com/*", "https://gfycat.com/*",
                    "https://www.gfycat.com/*"],
        "url": "https://api.gfycat.com/v1/oembed"}]},
    {"provider_name": "Grain", "endpoints": [{
        "schemes": ["https://grain.co/highlight/*",
                    "https://grain.com/share/*"],
        "url": "https://api.grain.com/_/api/oembed"}]},
    {"provider_name": "Gyazo", "endpoints": [{
        "schemes": ["https://gyazo.com/*"],
        "url": "https://api.gyazo.com/api/oembed"}]},
    {"provider_name": "hearthis.at", "endpoints": [{
        "schemes": ["https://hearthis.at/*/*/"],
        "url": "https://hearthis.at/oembed/"}]},
    {"provider_name": "iFixit", "endpoints": [{
        "schemes": ["http://www.ifixit.com/Guide/View/*",
                    "https://www.ifixit.com/Guide/View/*"],
        "url": "https://www.ifixit.com/Embed"}]},
    {"provider_name": "iHeartRadio", "endpoints": [{
        "schemes": ["https://www.iheart.com/podcast/*/episode/*"],
        "url": "https://www.iheart.com/oembed"}]},
    {"provider_name": "Infogram", "endpoints": [{
        "schemes": ["https://infogram.com/*"],
        "url": "https://infogram.com/oembed"}]},
    {"provider_name": "Kakao TV", "endpoints": [{
        "schemes": ["https://tv.kakao.com/channel/*/cliplink/*",
                    "https://tv.kakao.com/channel/*/livelink/*"],
        "url": "https://tv.kakao.com/oembed"}]},
    {"provider_name": "Kit", "endpoints": [{
        "schemes": ["http://kit.com/*/*", "https://kit.com/*/*"],
        "url": "https://embed.kit.com/oembed"}]},
    {"provider_name": "Livestream", "endpoints": [{
        "schemes": ["https://livestream.com/accounts/*/events/*",
                    "https://livestream.com/*/events/*",
                    "https://livestream.com/*/*"],
        "url": "https://livestream.com/oembed"}]},
    {"provider_name": "LottieFiles", "endpoints": [{
        "schemes": ["https://lottiefiles.com/*",
                    "https://*.lottiefiles.com/*"],
        "url": "https://embed.lottiefiles.com/oembed"}]},
    {"provider_name": "Matterport", "endpoints": [{
        "schemes": ["https://matterport.com/show/*",
                    "https://my.matterport.com/show/*"],
        "url": "https://my.matterport.com/api/v1/models/oembed/"}]},
    {"provider_name": "MuseScore", "endpoints": [{
        "schemes": ["https://musescore.com/user/*/scores/*",
                    "https://musescore.com/*/scores/*"],
        "url": "https://musescore.com/services/oembed"}]},
    {"provider_name": "NFB.ca", "endpoints": [{
        "schemes": ["http://*.nfb.ca/film/*", "https://*.nfb.ca/film/*"],
        "url": "https://www.nfb.ca/remote/services/oembed/"}]},
    {"provider_name": "Odesli", "endpoints": [{
        "schemes": ["https://song.link/*", "https://album.link/*",
                    "https://artist.link/*", "https://playlist.link/*",
                    "https://pods.link/*", "https://odesli.co/*"],
        "url": "https://song.link/oembed"}]},
    {"provider_name": "Odysee", "endpoints": [{
        "schemes": ["https://odysee.com/*/*", "https://odysee.com/*"],
        "url": "https://odysee.com/$/oembed"}]},
    {"provider_name": "Pastery", "endpoints": [{
        "schemes": ["http://www.pastery.net/*", "https://www.pastery.net/*",
                    "http://pastery.net/*", "https://pastery.net/*"],
        "url": "https://www.pastery.net/oembed"}]},
    {"provider_name": "Podbean", "endpoints": [{
        "schemes": ["https://*.podbean.com/e/*"],
        "url": "https://api.podbean.com/v1/oembed"}]},
    {"provider_name": "Replit", "endpoints": [{
        "schemes": ["https://repl.it/@*/*", "https://replit.com/@*/*"],
        "url": "https://replit.com/data/oembed"}]},
    {"provider_name": "ReverbNation", "endpoints": [{
        "schemes": ["https://www.reverbnation.com/*",
                    "https://www.reverbnation.com/*/songs/*"],
        "url": "https://www.reverbnation.com/oembed"}]},
    {"provider_name": "Rumble", "endpoints": [{
        "schemes": ["https://rumble.com/*"],
        "url": "https://rumble.com/api/Media/oembed.json"}]},
    {"provider_name": "Simplecast", "endpoints": [{
        "schemes": ["https://simplecast.com/s/*",
                    "https://player.simplecast.com/*"],
        "url": "https://api.simplecast.com/oembed"}]},
    {"provider_name": "SmugMug", "endpoints": [{
        "schemes": ["http://*.smugmug.com/*", "https://*.smugmug.com/*"],
        "url": "https://api.smugmug.com/services/oembed/"}]},
    {"provider_name": "SproutVideo", "endpoints": [{
        "schemes": ["https://sproutvideo.com/videos/*",
                    "https://*.vids.io/videos/*"],
        "url": "https://sproutvideo.com/oembed.json"}]},
    {"provider_name": "Sutori", "endpoints": [{
        "schemes": ["https://www.sutori.com/story/*"],
        "url": "https://www.sutori.com/api/oembed"}]},
    {"provider_name": "Sway", "endpoints": [{
        "schemes": ["https://sway.office.com/*", "https://www.sway.com/*",
                    "https://sway.com/*"],
        "url": "https://sway.office.com/api/v1.0/oembed"}]},
    {"provider_name": "The New York Times", "endpoints": [{
        "schemes": ["https://www.nytimes.com/svc/oembed",
                    "https://nytimes.com/*", "https://*.nytimes.com/*"],
        "url": "https://www.nytimes.com/svc/oembed/json/"}]},
    {"provider_name": "Ustream", "endpoints": [{
        "schemes": ["http://www.ustream.tv/*", "https://www.ustream.tv/*",
                    "http://www.ustream.com/*"],
        "url": "https://www.ustream.tv/oembed"}]},
    {"provider_name": "VideoPress (legacy)", "endpoints": [{
        "schemes": ["http://videopress.com/v/*"],
        "url": "https://public-api.wordpress.com/oembed/"}]},
    {"provider_name": "Vidyard", "endpoints": [{
        "schemes": ["https://*.vidyard.com/*",
                    "https://*.hubs.vidyard.com/*",
                    "https://play.vidyard.com/*"],
        "url": "https://api.vidyard.com/dashboard/v1.1/oembed.json"}]},
    {"provider_name": "VLIVE", "endpoints": [{
        "schemes": ["https://www.vlive.tv/video/*"],
        "url": "https://www.vlive.tv/oembed"}]},
    {"provider_name": "Vlipsy", "endpoints": [{
        "schemes": ["https://vlipsy.com/*"],
        "url": "https://vlipsy.com/oembed"}]},
    {"provider_name": "WordPress.com", "endpoints": [{
        "schemes": ["https://wordpress.com/*", "https://*.wordpress.com/*"],
        "url": "https://public-api.wordpress.com/oembed/"}]},
    {"provider_name": "Wistia (channels)", "endpoints": [{
        "schemes": ["https://*.wistia.com/channel/*"],
        "url": "https://fast.wistia.com/oembed.json"}]},
    {"provider_name": "Wokwi", "endpoints": [{
        "schemes": ["https://wokwi.com/share/*"],
        "url": "https://wokwi.com/api/oembed"}]},
    {"provider_name": "Wolfram Cloud", "endpoints": [{
        "schemes": ["https://www.wolframcloud.com/obj/*",
                    "https://*.wolframcloud.com/obj/*"],
        "url": "https://www.wolframcloud.com/oembed"}]},
    {"provider_name": "YouTube (embed/e)", "endpoints": [{
        "schemes": ["http://*.youtube.com/embed/*",
                    "https://*.youtube.com/embed/*",
                    "http://*.youtube.com/e/*",
                    "https://*.youtube.com/e/*",
                    "https://youtube.com/watch*",
                    "https://youtube.com/shorts/*",
                    "https://youtube.com/playlist?list=*"],
        "url": "https://www.youtube.com/oembed?format=json&url="}]},
    {"provider_name": "Zeplin", "endpoints": [{
        "schemes": ["https://app.zeplin.io/project/*/screen/*",
                    "https://app.zeplin.io/project/*/styleguide/*"],
        "url": "https://api.zeplin.io/v2/oembed"}]},
    {"provider_name": "Znipe TV", "endpoints": [{
        "schemes": ["https://*.znipe.tv/*"],
        "url": "https://api.znipe.tv/v3/oembed/"}]},
    {"provider_name": "Vev", "endpoints": [{
        "schemes": ["https://*.vev.site/*"],
        "url": "https://embed.vev.design/oembed"}]},
    {"provider_name": "Typecast", "endpoints": [{
        "schemes": ["https://play.typecast.ai/s/*",
                    "https://play.typecast.ai/e/*"],
        "url": "https://play.typecast.ai/oembed"}]},
    {"provider_name": "Tuxx", "endpoints": [{
        "schemes": ["https://www.tuxx.be/*"],
        "url": "https://www.tuxx.be/services/oembed"}]},
    {"provider_name": "Spreaker", "endpoints": [{
        "schemes": ["http://*.spreaker.com/*", "https://*.spreaker.com/*"],
        "url": "https://api.spreaker.com/oembed"}]},
    {"provider_name": "SlideShare (short)", "endpoints": [{
        "schemes": ["http://www.slideshare.net/*/*",
                    "https://slideshare.net/*/*",
                    "http://slidesha.re/*"],
        "url": "https://www.slideshare.net/api/oembed/2?format=json&url="}]},
    {"provider_name": "Smrthi", "endpoints": [{
        "schemes": ["https://www.smrthi.com/book/*"],
        "url": "https://www.smrthi.com/api/oembed"}]},
    {"provider_name": "SocialExplorer", "endpoints": [{
        "schemes": ["https://www.socialexplorer.com/*/explore",
                    "https://www.socialexplorer.com/*/view",
                    "https://www.socialexplorer.com/*/embed"],
        "url": "https://www.socialexplorer.com/services/oembed/"}]},
    {"provider_name": "Songlink (embed)", "endpoints": [{
        "schemes": ["https://embed.song.link/*"],
        "url": "https://song.link/oembed"}]},
    {"provider_name": "Stream (IBM Video)", "endpoints": [{
        "schemes": ["https://video.ibm.com/*"],
        "url": "https://video.ibm.com/oembed"}]},
    {"provider_name": "Uppy (Transloadit demos)", "endpoints": [{
        "schemes": ["https://uppy.io/examples/*"],
        "url": "https://uppy.io/examples/oembed"}]},
    # third batch of public-registry entries (entries where the public
    # endpoint is well established; the verbatim dump still drops in via
    # load_registry at deploy time)
    {"provider_name": "Facebook (post)", "endpoints": [{
        "schemes": ["https://www.facebook.com/*/posts/*",
                    "https://www.facebook.com/*/photos/*",
                    "https://www.facebook.com/photo.php*",
                    "https://www.facebook.com/permalink.php*"],
        "url": "https://graph.facebook.com/v16.0/oembed_post?format=json&url="}]},
    {"provider_name": "Facebook (video)", "endpoints": [{
        "schemes": ["https://www.facebook.com/*/videos/*",
                    "https://www.facebook.com/video.php*",
                    "https://www.facebook.com/watch/*"],
        "url": "https://graph.facebook.com/v16.0/oembed_video?format=json&url="}]},
    {"provider_name": "Padlet", "endpoints": [{
        "schemes": ["https://padlet.com/*"],
        "url": "https://padlet.com/oembed/"}]},
    {"provider_name": "Poll Everywhere", "endpoints": [{
        "schemes": ["http://www.polleverywhere.com/polls/*",
                    "http://www.polleverywhere.com/multiple_choice_polls/*",
                    "http://www.polleverywhere.com/free_text_polls/*"],
        "url": "https://www.polleverywhere.com/services/oembed/"}]},
    {"provider_name": "RadioPublic", "endpoints": [{
        "schemes": ["https://play.radiopublic.com/*",
                    "https://radiopublic.com/*",
                    "https://www.radiopublic.com/*"],
        "url": "https://oembed.radiopublic.com/oembed"}]},
    {"provider_name": "LearningApps.org", "endpoints": [{
        "schemes": ["http://learningapps.org/*",
                    "https://learningapps.org/*"],
        "url": "https://learningapps.org/oembed.php"}]},
    {"provider_name": "DocDroid", "endpoints": [{
        "schemes": ["https://*.docdroid.net/*",
                    "https://docdro.id/*"],
        "url": "https://www.docdroid.net/api/oembed"}]},
    {"provider_name": "DTube", "endpoints": [{
        "schemes": ["https://d.tube/v/*"],
        "url": "https://api.d.tube/oembed"}]},
    {"provider_name": "Overflow", "endpoints": [{
        "schemes": ["https://overflow.io/s/*",
                    "https://overflow.io/embed/*"],
        "url": "https://overflow.io/services/oembed"}]},
    {"provider_name": "Chirbit.com", "endpoints": [{
        "schemes": ["http://chirb.it/*"],
        "url": "https://chirb.it/oembed.json"}]},
    {"provider_name": "Stanford Digital Repository", "endpoints": [{
        "schemes": ["https://purl.stanford.edu/*"],
        "url": "https://purl.stanford.edu/embed.json"}]},
    {"provider_name": "Screencast.com", "endpoints": [{
        "schemes": ["http://www.screencast.com/*",
                    "https://www.screencast.com/*"],
        "url": "https://api.screencast.com/external/oembed"}]},
    {"provider_name": "Slides", "endpoints": [{
        "schemes": ["https://slides.com/*",
                    "https://slides.com/*/*"],
        "url": "https://slides.com/services/oembed"}]},
    {"provider_name": "RunKit", "endpoints": [{
        "schemes": ["https://runkit.com/*"],
        "url": "https://embed.runkit.com/oembed"}]},
    {"provider_name": "Ceros", "endpoints": [{
        "schemes": ["https://view.ceros.com/*"],
        "url": "https://view.ceros.com/oembed"}]},
    {"provider_name": "nanoo.tv", "endpoints": [{
        "schemes": ["https://*.nanoo.tv/link/*",
                    "https://nanoo.tv/link/*",
                    "https://media.zhdk.ch/signatur/*"],
        "url": "https://www.nanoo.tv/services/oembed"}]},
    {"provider_name": "Nasjonalbiblioteket", "endpoints": [{
        "schemes": ["https://www.nb.no/items/*"],
        "url": "https://api.nb.no/catalog/v1/oembed"}]},
    {"provider_name": "Whimsical", "endpoints": [{
        "schemes": ["https://whimsical.com/*"],
        "url": "https://whimsical.com/api/oembed"}]},
    {"provider_name": "Wordwall", "endpoints": [{
        "schemes": ["https://wordwall.net/resource/*"],
        "url": "https://wordwall.net/api/oembed"}]},
    {"provider_name": "Toornament", "endpoints": [{
        "schemes": ["https://www.toornament.com/tournaments/*/information",
                    "https://www.toornament.com/tournaments/*/registration/",
                    "https://www.toornament.com/tournaments/*/matches/schedule",
                    "https://www.toornament.com/tournaments/*/stages/*/"],
        "url": "https://widget.toornament.com/oembed"}]},
    {"provider_name": "Portfolium", "endpoints": [{
        "schemes": ["https://portfolium.com/entry/*"],
        "url": "https://api.portfolium.com/oembed"}]},
    {"provider_name": "Moby Picture", "endpoints": [{
        "schemes": ["http://www.mobypicture.com/user/*/view/*",
                    "http://moby.to/*"],
        "url": "http://api.mobypicture.com/oEmbed"}]},
    {"provider_name": "Music Box Maniacs", "endpoints": [{
        "schemes": ["https://musicboxmaniacs.com/explore/melody/*"],
        "url": "https://musicboxmaniacs.com/explore/embed/"}]},
    {"provider_name": "EthFiddle", "endpoints": [{
        "schemes": ["https://ethfiddle.com/*"],
        "url": "https://ethfiddle.com/services/oembed/"}]},
    {"provider_name": "Waveform (Simplecast player)", "endpoints": [{
        "schemes": ["https://player.simplecast.com/*"],
        "url": "https://api.simplecast.com/oembed"}]},
    {"provider_name": "GT Channel", "endpoints": [{
        "schemes": ["https://gtchannel.com/watch/*"],
        "url": "https://api.luminery.com/oembed"}]},
    {"provider_name": "Kooapp", "endpoints": [{
        "schemes": ["https://*.kooapp.com/koo/*"],
        "url": "https://embed.kooapp.com/services/oembed"}]},
    {"provider_name": "Minesweeper.today", "endpoints": [{
        "schemes": ["https://minesweeper.today/*"],
        "url": "https://minesweeper.today/api/oembed"}]},
    {"provider_name": "Jovian", "endpoints": [{
        "schemes": ["https://jovian.ai/viewer*",
                    "https://jovian.com/viewer*"],
        "url": "https://api.jovian.ai/oembed.json"}]},
    {"provider_name": "Qualifio", "endpoints": [{
        "schemes": ["https://qualifio.com/*"],
        "url": "https://oembed.qualifio.com/"}]},
]
